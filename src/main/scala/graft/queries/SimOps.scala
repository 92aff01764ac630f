package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Embedding similarity search over `embeddings` (64-dim float vectors):
  * brute-force cosine top-k as the exactness baseline, IVF-style
  * cluster-probed ANN as the scale path, and blocked near-dup pairing.
  *
  * Cross-engine determinism: every cosine is computed with the same formula
  * — a sequential left-fold dot product over elements cast to double
  * (`zip_with` + `aggregate` in Spark ≡ `list_dot_product` on `DOUBLE[]` in
  * DuckDB; float→double casts are exact, float×float products fit double
  * exactly, and both engines accumulate in index order).
  *
  * Scale notes: the brute-force query broadcasts the (tiny) query set and
  * streams candidates — one pass, no shuffle until top-k. The IVF variant
  * bounds candidate generation by cluster assignment (a broadcast join on
  * centroid id), the pattern that survives 100 TB where all-pairs does not.
  */
object SimOps {

  /** Sequential-fold dot product of two array<float> columns in double. */
  private def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  private def cosine(a: Column, b: Column): Column =
    dot(a, b) / sqrt(dot(a, a) * dot(b, b))

  /** DuckDB-side mirror of [[cosine]]. */
  private def sqlCosine(a: String, b: String): String =
    s"list_dot_product($a, $b) / sqrt(list_dot_product($a, $a) * list_dot_product($b, $b))"

  // ---------------------------------------------------------------- q50
  /** Brute-force cosine top-k: 8 query vectors × all candidates, exact
    * ranking. Query side broadcast; candidates never shuffled pre-rank. */
  val q50AnnBruteforce = Q(
    "q50_ann_bruteforce",
    (s, d) => {
      val e = Tables.embeddings(s, d)
      val queries = e.filter(col("vec_id") < 8)
        .select(col("vec_id").as("qid"), col("embedding").as("qv"))
      val cands = e.select(col("vec_id").as("vid"), col("embedding").as("cv"))
      val w = Window.partitionBy(col("qid"))
        .orderBy(col("cos").desc, col("vid"))
      broadcast(queries).join(cands, col("qid") =!= col("vid"))
        .withColumn("cos", cosine(col("qv"), col("cv")))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 5)
        .select(col("qid"), col("rank"), col("vid"),
          round(col("cos"), 6).as("cos_r"))
        .orderBy(col("qid"), col("rank"))
    },
    Some(s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v
        FROM embeddings),
      scored AS (
        SELECT q.vec_id AS qid, c.vec_id AS vid,
          ${sqlCosine("q.v", "c.v")} AS cos
        FROM e q JOIN e c ON q.vec_id < 8 AND q.vec_id <> c.vec_id),
      ranked AS (
        SELECT qid, vid, cos, row_number() OVER (
          PARTITION BY qid ORDER BY cos DESC, vid) AS rank
        FROM scored)
      SELECT qid, rank, vid, round(cos, 6) AS cos_r FROM ranked
      WHERE rank <= 5 ORDER BY qid, rank"""),
    bench = true)

  // ---------------------------------------------------------------- q51
  /** IVF-style ANN: 16 fixed centroids (lowest vec_ids — a deterministic
    * stand-in for trained centroids), every vector assigned to its nearest
    * centroid, queries probe their top-2 centroids only. Approximate by
    * construction but fully deterministic, so the oracle replicates it
    * exactly. */
  val q51AnnIvf = Q(
    "q51_ann_ivf",
    (s, d) => {
      val e = Tables.embeddings(s, d)
      val cents = e.filter(col("vec_id") < 16)
        .select(col("vec_id").as("cid"), col("embedding").as("cv"))
      def assign(src: DataFrame, vecCol: String, outCol: String, topN: Int) = {
        val w = Window.partitionBy(col("vec_id"))
          .orderBy(col("ccos").desc, col("cid"))
        src.crossJoin(broadcast(cents))
          .withColumn("ccos", cosine(col(vecCol), col("cv")))
          .withColumn("crank", row_number().over(w))
          .filter(col("crank") <= topN)
          .select(src("vec_id"), col(vecCol), col("cid").as(outCol))
      }
      val assigned = assign(
        e.select(col("vec_id"), col("embedding")), "embedding", "cluster", 1)
      val probes = assign(
        e.filter(col("vec_id") < 8).select(col("vec_id"), col("embedding")),
        "embedding", "cluster", 2)
        .withColumnRenamed("vec_id", "qid")
        .withColumnRenamed("embedding", "qv")
      val w = Window.partitionBy(col("qid"))
        .orderBy(col("cos").desc, col("vid"))
      probes.join(
          assigned.withColumnRenamed("vec_id", "vid")
            .withColumnRenamed("embedding", "cv"),
          Seq("cluster"))
        .filter(col("qid") =!= col("vid"))
        .withColumn("cos", cosine(col("qv"), col("cv")))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 5)
        .select(col("qid"), col("rank"), col("vid"),
          round(col("cos"), 6).as("cos_r"))
        .orderBy(col("qid"), col("rank"))
    },
    Some(s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v
        FROM embeddings),
      cents AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < 16),
      assigned AS (
        SELECT vec_id, v, cid AS cluster FROM (
          SELECT e.vec_id, e.v, c.cid, row_number() OVER (
            PARTITION BY e.vec_id
            ORDER BY ${sqlCosine("e.v", "c.cv")} DESC, c.cid) AS crank
          FROM e CROSS JOIN cents c) a WHERE crank = 1),
      probes AS (
        SELECT vec_id AS qid, v AS qv, cid AS cluster FROM (
          SELECT e.vec_id, e.v, c.cid, row_number() OVER (
            PARTITION BY e.vec_id
            ORDER BY ${sqlCosine("e.v", "c.cv")} DESC, c.cid) AS crank
          FROM e CROSS JOIN cents c WHERE e.vec_id < 8) a WHERE crank <= 2),
      scored AS (
        SELECT p.qid, a.vec_id AS vid,
          ${sqlCosine("p.qv", "a.v")} AS cos
        FROM probes p JOIN assigned a ON p.cluster = a.cluster
        WHERE p.qid <> a.vec_id),
      ranked AS (
        SELECT qid, vid, cos, row_number() OVER (
          PARTITION BY qid ORDER BY cos DESC, vid) AS rank FROM scored)
      SELECT qid, rank, vid, round(cos, 6) AS cos_r FROM ranked
      WHERE rank <= 5 ORDER BY qid, rank"""))

  // ---------------------------------------------------------------- q52
  /** Embedding-cosine near-duplicate pairs, blocked by `label` (the
    * blocking key stands in for an LSH bucket): exact cosine ≥ 0.25 within
    * block only — pair space bounded by block sizes, never all-pairs. */
  val q52EmbedNeardup = Q(
    "q52_embed_neardup",
    (s, d) => {
      val e = Tables.embeddings(s, d)
        .select(col("vec_id"), col("label"), col("embedding"))
      val a = e.alias("a")
      val b = e.alias("b")
      a.join(b,
          col("a.label") === col("b.label") &&
          col("a.vec_id") < col("b.vec_id"))
        .withColumn("cos", cosine(col("a.embedding"), col("b.embedding")))
        .filter(col("cos") >= 0.25)
        .select(col("a.vec_id").as("id_a"), col("b.vec_id").as("id_b"),
          col("a.label").as("label"), round(col("cos"), 6).as("cos_r"))
        .orderBy(col("id_a"), col("id_b"))
    },
    Some(s"""WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v
        FROM embeddings)
      SELECT a.vec_id AS id_a, b.vec_id AS id_b, a.label AS label,
        round(${sqlCosine("a.v", "b.v")}, 6) AS cos_r
      FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
      WHERE ${sqlCosine("a.v", "b.v")} >= 0.25
      ORDER BY id_a, id_b"""),
    bench = true)

  val all: Seq[Q] = Seq(q50AnnBruteforce, q51AnnIvf, q52EmbedNeardup)
}
