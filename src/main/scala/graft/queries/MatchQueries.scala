package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.functions.GraftFunctions
import graft.operators.{Bm25, FuzzyJoin, RankFusion, Skyline}

/** Entity-matching and frontier-selection queries: blocked edit-distance
  * self-join (the MBID/name-cleanup shape,
  * listenbrainz_spark/postgres/artist.py) and the 2-D Pareto skyline
  * used for non-dominated curation picks.
  */
object MatchQueries {

  // ---------------------------------------------------------------- q196
  /** Fuzzy self-join over sampled customer names at edit distance ≤ 1 —
    * [[graft.operators.FuzzyJoin]]'s q-gram prefix-filter blocking plus
    * early-exit levenshtein verify. The oracle is the brute-force
    * quadratic join, so the driver gate proves the blocked pair set is
    * EXACTLY the all-pairs answer. */
  val q196FuzzyJoin = Q(
    "q196_fuzzy_join",
    (s, d) => FuzzyJoin.selfJoin(
      Tables.customer(s, d).filter(col("c_custkey") % 10 === 0),
      idCol = "c_custkey", strCol = "c_name", k = 1, q = 2)
      .orderBy(col("a_id"), col("b_id")),
    Some("""WITH c AS (
        SELECT c_custkey AS id, c_name AS s FROM customer
        WHERE c_custkey % 10 = 0)
      SELECT a.id AS a_id, b.id AS b_id, a.s AS a_str, b.s AS b_str,
        cast(levenshtein(a.s, b.s) AS bigint) AS dist
      FROM c a JOIN c b ON a.id < b.id
      WHERE abs(len(a.s) - len(b.s)) <= 1 AND levenshtein(a.s, b.s) <= 1
      ORDER BY a_id, b_id"""))

  // ---------------------------------------------------------------- q197
  /** Pareto frontier of parts maximizing (retail price, size) —
    * [[graft.operators.Skyline]]'s bucket-prune + exact-sliver pass.
    * The oracle is the quadratic NOT EXISTS dominance test, so the
    * driver gate proves the pruned two-phase answer equals the
    * definitional skyline. */
  val q197Skyline = Q(
    "q197_skyline",
    (s, d) => Skyline.frontier2D(
      Tables.part(s, d), xCol = "p_retailprice", yCol = "p_size")
      .orderBy(col("p_retailprice"), col("p_size")),
    Some("""WITH p AS (
        SELECT DISTINCT p_retailprice AS x, cast(p_size AS double) AS y
        FROM part)
      SELECT x AS p_retailprice, y AS p_size FROM p a
      WHERE NOT EXISTS (
        SELECT 1 FROM p b WHERE b.x >= a.x AND b.y >= a.y
          AND (b.x > a.x OR b.y > a.y))
      ORDER BY 1, 2"""))

  // ---------------------------------------------------------------- q198
  /** Hybrid retrieval: BM25 lexical top-20 (q186's exact fixed-point
    * scorer) fused with embedding-cosine top-20 (query = vector 0,
    * doc_id ≡ vec_id) by [[graft.operators.RankFusion]]'s reciprocal-rank
    * fusion. Both input rankings and the bigint RRF total are exact, so
    * the fused list is driver-hash reproducible end to end — the lexical
    * + dense merge every RAG corpus build runs. */
  val q198HybridRrf = Q(
    "q198_hybrid_rrf",
    (s, d) => {
      GraftFunctions.register(s)
      val bm25 = Bm25.retrieve(Tables.documents(s, d), "doc_id", "text",
        "hash join scan vector", k = 20)
        .select(col("doc_id"), col("doc_rank").as("rank"))
      val e = Tables.embeddings(s, d)
      val qv = e.filter(col("vec_id") === 0)
        .select(col("embedding").as("qv"))
      val wAnn = Window.orderBy(col("cos").desc, col("doc_id"))
      val ann = e.filter(col("vec_id") =!= 0)
        .crossJoin(broadcast(qv))
        .withColumn("cos",
          GraftFunctions.vecDot(col("qv"), col("embedding")) /
            sqrt(GraftFunctions.vecDot(col("qv"), col("qv")) *
              GraftFunctions.vecDot(col("embedding"), col("embedding"))))
        .select(col("vec_id").as("doc_id"), col("cos"))
        .orderBy(col("cos").desc, col("doc_id")).limit(20)
        .withColumn("rank", row_number().over(wAnn).cast("long"))
        .select(col("doc_id"), col("rank"))
      RankFusion.reciprocalRankFusion(Seq(bm25, ann), "doc_id", "rank",
          k0 = 60, topK = 10)
        .orderBy(col("fused_rank"))
    },
    Some("""WITH t AS (SELECT doc_id,
        list_filter(string_split(text, ' '), x -> x <> '') AS toks
      FROM documents),
      stats AS (SELECT count(*) AS n,
        cast(sum(len(toks)) AS bigint) AS tot FROM t),
      tf AS (SELECT doc_id, term, count(*) AS tf
        FROM (SELECT doc_id, unnest(toks) AS term FROM t)
        WHERE term IN ('hash', 'join', 'scan', 'vector')
        GROUP BY 1, 2),
      dl AS (SELECT doc_id, cast(len(toks) AS bigint) AS dl FROM t),
      df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
      sc AS (SELECT doc_id,
          cast(floor(
            (cast(2 * n - 2 * df + 1 AS double)
              / cast(2 * df + 1 AS double))
            * (cast(22 * tot * tf AS double)
              / cast(10 * tot * tf + 3 * tot + 9 * n * dl AS double))
            * 1000000e0) AS bigint) AS score_fp
        FROM tf JOIN dl USING (doc_id) JOIN df USING (term), stats),
      bm AS (SELECT doc_id, row_number() OVER (
          ORDER BY cast(sum(score_fp) AS bigint) DESC, doc_id) AS rank
        FROM sc GROUP BY doc_id),
      e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      qv AS (SELECT v AS q FROM e WHERE vec_id = 0),
      ann AS (SELECT c.vec_id AS doc_id, row_number() OVER (ORDER BY
          list_dot_product(q, c.v) / sqrt(list_dot_product(q, q)
            * list_dot_product(c.v, c.v)) DESC, c.vec_id) AS rank
        FROM e c, qv WHERE c.vec_id <> 0),
      lists AS (
        SELECT doc_id, rank FROM bm WHERE rank <= 20
        UNION ALL
        SELECT doc_id, rank FROM ann WHERE rank <= 20),
      fused AS (SELECT doc_id,
          cast(sum(cast(round(1e12 / (60 + rank)) AS bigint)) AS bigint)
            AS rrf_fp,
          count(*) AS n_lists
        FROM lists GROUP BY doc_id),
      r AS (SELECT *, row_number() OVER (ORDER BY rrf_fp DESC, doc_id)
          AS fused_rank FROM fused)
      SELECT doc_id, rrf_fp, n_lists, cast(fused_rank AS bigint)
        AS fused_rank
      FROM r WHERE fused_rank <= 10 ORDER BY fused_rank"""))

  def all: Seq[Q] = Seq(q196FuzzyJoin, q197Skyline, q198HybridRrf)
}
