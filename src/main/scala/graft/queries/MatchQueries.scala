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
    * EXACTLY the all-pairs answer — for ANY gram size, which is why the
    * query runs the production AutoQ path (selectQ measures every
    * candidate gram size in one corpus pass and picks the smallest
    * viable one) instead of pinning q: the round-10 100× probe showed a
    * pinned q=3 crossing the degenerate fail-fast on the grown
    * templated corpus (avg block load ~580 > 512) while the measured
    * path simply selects a wider gram and proceeds. */
  val q196FuzzyJoin = Q(
    "q196_fuzzy_join",
    (s, d) => FuzzyJoin.selfJoin(
      Tables.customer(s, d).filter(col("c_custkey") % 10 === 0),
      idCol = "c_custkey", strCol = "c_name", k = 1)
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

  // ---------------------------------------------------------------- q203
  /** Nearest-centroid label diagnostics over the labeled embeddings:
    * per-label centroids on the INTEGER code lattice (round(Σcode/n) of
    * int8 codes — the q155 exactness discipline, so the whole confusion
    * matrix is bit-reproducible, which float centroids cannot be), every
    * vector assigned to its nearest label centroid by exact integer
    * squared distance, and the (label, pred) confusion cells with
    * per-label share (diagonal = per-class recall). The standard quick
    * health check on an embedding table's labels — label noise and
    * cluster overlap show up as off-diagonal mass.
    *
    * Scale: centroids are |labels|×dims integers (broadcast);
    * assignment is the one-pass map [[QuantizedKMeans.assign]];
    * the confusion aggregate is |labels|² cells.
    */
  val q203LabelConfusion = Q(
    "q203_label_confusion",
    (s, d) => {
      import graft.operators.{QuantizedKMeans, VectorQuantization}
      val q = VectorQuantization
        .quantizeInt8(Tables.embeddings(s, d), "embedding")
        .select(col("vec_id"), col("label").cast("long").as("label"),
          col("q8"), col("qnorm2"))
      val cents = q
        .select(col("label"), posexplode(col("q8"))
          .as(Seq("dim_pos", "c")))
        .groupBy(col("label"), col("dim_pos"))
        .agg(sum(col("c")).as("code_sum"), count(lit(1)).as("n"))
        .withColumn("cc", round(col("code_sum") / col("n")).cast("int"))
        .groupBy(col("label"))
        .agg(transform(
          array_sort(collect_list(struct(col("dim_pos"), col("cc")))),
          x => x.getField("cc")).as("c8"))
        .select(col("label").as("cluster_id"), col("c8"),
          VectorQuantization.int8Dot(col("c8"), col("c8")).as("cnorm2"))
      val assigned = QuantizedKMeans.assign(
        q.select(col("vec_id"), col("q8"), col("qnorm2")), cents,
        "vec_id")
      val wl = Window.partitionBy(col("label"))
      assigned
        .join(q.select(col("vec_id"), col("label")), Seq("vec_id"))
        .groupBy(col("label"), col("cluster_id").as("pred"))
        .agg(count(lit(1)).as("n"))
        .withColumn("label_total", sum(col("n")).over(wl))
        .withColumn("share", col("n") / col("label_total"))
        .select(col("label"), col("pred"), col("n"), col("label_total"),
          col("share"))
        .orderBy(col("label"), col("pred"))
    },
    Some("""WITH e AS (SELECT vec_id, label::BIGINT AS label,
        embedding::DOUBLE[] AS v FROM embeddings),
      sc AS (SELECT vec_id, label, v,
        127.0 / greatest(list_max(list_transform(v, x -> abs(x))), 1e-30)
          AS scale FROM e),
      q AS (SELECT vec_id, label,
        list_transform(v, x -> cast(round(x * scale) AS BIGINT)) AS qv
        FROM sc),
      nn AS (SELECT vec_id, label, qv,
        cast(list_dot_product(qv::DOUBLE[], qv::DOUBLE[]) AS BIGINT)
          AS qn2 FROM q),
      dims AS (SELECT label, g.dim_pos, qv[g.dim_pos] AS c
        FROM q, unnest(generate_series(1, len(qv))) AS g(dim_pos)),
      cdim AS (SELECT label, dim_pos,
          cast(round(sum(c) / count(*)) AS BIGINT) AS cc
        FROM dims GROUP BY 1, 2),
      cents AS (SELECT label AS cluster_id,
          list(cc ORDER BY dim_pos) AS cv
        FROM cdim GROUP BY 1),
      cn AS (SELECT cluster_id, cv,
        cast(list_dot_product(cv::DOUBLE[], cv::DOUBLE[]) AS BIGINT)
          AS cn2 FROM cents),
      d AS (SELECT nn.vec_id, nn.label, cn.cluster_id,
          row_number() OVER (PARTITION BY nn.vec_id
            ORDER BY nn.qn2 + cn.cn2 - 2 * cast(
              list_dot_product(nn.qv::DOUBLE[], cn.cv::DOUBLE[])
                AS BIGINT), cn.cluster_id) AS rk
        FROM nn, cn),
      conf AS (SELECT label, cluster_id AS pred, count(*) AS n
        FROM d WHERE rk = 1 GROUP BY 1, 2)
      SELECT label, pred, n,
        cast(sum(n) OVER (PARTITION BY label) AS BIGINT) AS label_total,
        n / cast(sum(n) OVER (PARTITION BY label) AS BIGINT) AS share
      FROM conf ORDER BY label, pred"""))

  // ---------------------------------------------------------------- q207
  /** Incremental fuzzy matching: the day's new names probe a PERSISTED
    * gram index of the existing corpus ([[graft.operators.FuzzyJoin]]
    * buildIndex/probe) — corpus↔batch and batch-internal pairs only,
    * never corpus×corpus. The oracle is the brute-force join over the
    * union restricted to batch-touching pairs (the q139 incremental
    * contract applied to entity matching). */
  val q207FuzzyProbe = Q(
    "q207_fuzzy_probe",
    (s, d) => {
      // scale-invariant 80/20 split: every 5th sampled key is "today's
      // batch", the rest are the indexed corpus — the proportions hold
      // at any scale factor, unlike an absolute key cutoff
      val sample = Tables.customer(s, d)
        .filter(col("c_custkey") % 10 === 0)
      val corpus = sample.filter(expr("(c_custkey div 10) % 5 != 0"))
      val batch = sample.filter(expr("(c_custkey div 10) % 5 = 0"))
      // AutoQ, like q196: at 100× the pinned q=3 sat one threshold-hair
      // under the degenerate fail-fast (load ~480 of 512) — measure q
      // per corpus instead of riding the margin
      val idx = FuzzyJoin.buildIndex(corpus, "c_custkey", "c_name", k = 1)
      FuzzyJoin.probe(idx, batch, "c_custkey", "c_name")
        .orderBy(col("a_id"), col("b_id"))
    },
    Some("""WITH c AS (
        SELECT c_custkey AS id, c_name AS s FROM customer
        WHERE c_custkey % 10 = 0)
      SELECT a.id AS a_id, b.id AS b_id, a.s AS a_str, b.s AS b_str,
        cast(levenshtein(a.s, b.s) AS bigint) AS dist
      FROM c a JOIN c b ON a.id < b.id
      WHERE ((a.id // 10) % 5 = 0 OR (b.id // 10) % 5 = 0)
        AND abs(len(a.s) - len(b.s)) <= 1 AND levenshtein(a.s, b.s) <= 1
      ORDER BY a_id, b_id"""))

  // ---------------------------------------------------------------- q210
  /** Random-walk training corpus over the part↔supplier bipartite graph
    * ([[graft.operators.RandomWalks]]): deterministic congruential-mix
    * walks, then skip-gram (center, context) pair counts — the DeepWalk
    * data-prep stage as a pure function of the edge set, so a RECURSIVE
    * CTE replays every step and the driver hash-checks a random-walk
    * corpus end to end. */
  val q210WalkCorpus = Q(
    "q210_walk_corpus",
    (s, d) => {
      import graft.operators.RandomWalks
      val e0 = Tables.lineitem(s, d)
        .select(col("l_partkey").as("a"),
          (col("l_suppkey") + lit(10000000L)).as("b"))
        .distinct()
      val edges = e0.unionByName(
        e0.select(col("b").as("a"), col("a").as("b")))
      val w = RandomWalks.walks(edges, "a", "b",
        walksPerNode = 1, length = 4)
      RandomWalks.skipGramPairs(w, window = 2)
        .orderBy(col("center"), col("context"))
    },
    Some("""WITH RECURSIVE e0 AS (
        SELECT DISTINCT l_partkey AS a, l_suppkey + 10000000 AS b
        FROM lineitem),
      edges AS (SELECT a, b FROM e0 UNION SELECT b, a FROM e0),
      adj AS (SELECT a AS node, b AS nbr,
          row_number() OVER (PARTITION BY a ORDER BY b) - 1 AS idx,
          count(*) OVER (PARTITION BY a) AS deg
        FROM edges),
      starts AS (SELECT DISTINCT node FROM adj),
      walk(walk_id, step, node) AS (
        SELECT node, 0, node FROM starts
        UNION ALL
        SELECT w.walk_id, w.step + 1, a.nbr
        FROM walk w JOIN adj a ON a.node = w.node
          AND a.idx = ((w.node * 2654435761 + w.walk_id * 40503
            + (w.step + 1) * 69069) % 2147483647) % a.deg
        WHERE w.step < 4),
      pairs AS (
        SELECT x.node AS center, y.node AS context, count(*) AS n
        FROM walk x JOIN walk y ON x.walk_id = y.walk_id
          AND x.step <> y.step AND abs(x.step - y.step) <= 2
        GROUP BY 1, 2)
      SELECT center, context, n FROM pairs ORDER BY center, context"""))

  // ---------------------------------------------------------------- q211
  /** Contrastive training triples (query, positive, negative): for each
    * query vector, positives are the exact cosine top-3 (the q50
    * ranking) and negatives are md5-ranked draws from the non-positive
    * remainder (the q79/q137 deterministic-sampling discipline) — the
    * (anchor, pos, neg) generation step of every embedding-model
    * training pipeline, fully hash-reproducible. */
  val q211ContrastiveTriples = Q(
    "q211_contrastive_triples",
    (s, d) => {
      GraftFunctions.register(s)
      val e = Tables.embeddings(s, d)
        .select(col("vec_id"), col("embedding"),
          GraftFunctions.vecDot(col("embedding"), col("embedding"))
            .as("n2"))
      val queries = e.filter(col("vec_id") < 4)
        .select(col("vec_id").as("qid"), col("embedding").as("qv"),
          col("n2").as("qn2"))
      val wq = Window.partitionBy(col("qid"))
        .orderBy(col("cos").desc, col("vid"))
      val pos = broadcast(queries)
        .join(e.select(col("vec_id").as("vid"),
          col("embedding").as("cv"), col("n2").as("cn2")),
          col("qid") =!= col("vid"))
        .withColumn("cos", GraftFunctions.vecDot(col("qv"), col("cv")) /
          sqrt(col("qn2") * col("cn2")))
        .withColumn("pos_rank", row_number().over(wq).cast("long"))
        .filter(col("pos_rank") <= 3)
        .select(col("qid"), col("vid").as("pos_id"), col("pos_rank"))
      val wn = Window.partitionBy(col("qid"))
        .orderBy(col("tik"), col("vid"))
      val neg = e.select(col("vec_id").as("vid"))
        .crossJoin(broadcast(queries.select(col("qid"))))
        .filter(col("qid") =!= col("vid"))
        .join(pos.select(col("qid"), col("pos_id").as("vid")),
          Seq("qid", "vid"), "left_anti")
        .withColumn("tik", md5(concat_ws(":", col("qid"), col("vid"))))
        .withColumn("neg_rank", row_number().over(wn).cast("long"))
        .filter(col("neg_rank") <= 3)
        .select(col("qid"), col("vid").as("neg_id"), col("neg_rank"))
      pos.join(neg, Seq("qid"))
        .select(col("qid"), col("pos_id"), col("pos_rank"),
          col("neg_id"), col("neg_rank"))
        .orderBy(col("qid"), col("pos_rank"), col("neg_rank"))
    },
    Some("""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v
        FROM embeddings),
      q AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id < 4),
      pos AS (SELECT qid, vid, pos_rank FROM (
        SELECT q.qid, c.vec_id AS vid, row_number() OVER (
            PARTITION BY q.qid ORDER BY
              list_dot_product(q.qv, c.v) / sqrt(
                list_dot_product(q.qv, q.qv)
                * list_dot_product(c.v, c.v)) DESC, c.vec_id) AS pos_rank
        FROM q, e c WHERE q.qid <> c.vec_id) z WHERE pos_rank <= 3),
      neg AS (SELECT qid, vid, neg_rank FROM (
        SELECT q.qid, c.vec_id AS vid, row_number() OVER (
            PARTITION BY q.qid ORDER BY
              md5(q.qid || ':' || c.vec_id), c.vec_id) AS neg_rank
        FROM q, e c WHERE q.qid <> c.vec_id
          AND NOT EXISTS (SELECT 1 FROM (
            SELECT qq.qid AS pqid, cc.vec_id AS pvid, row_number() OVER (
                PARTITION BY qq.qid ORDER BY
                  list_dot_product(qq.qv, cc.v) / sqrt(
                    list_dot_product(qq.qv, qq.qv)
                    * list_dot_product(cc.v, cc.v)) DESC,
                  cc.vec_id) AS pr
            FROM q qq, e cc WHERE qq.qid <> cc.vec_id) p
            WHERE p.pqid = q.qid AND p.pvid = c.vec_id AND p.pr <= 3))
          z WHERE neg_rank <= 3)
      SELECT pos.qid, pos.vid AS pos_id, pos_rank,
        neg.vid AS neg_id, neg_rank
      FROM pos JOIN neg ON pos.qid = neg.qid
      ORDER BY pos.qid, pos_rank, neg_rank"""))

  def all: Seq[Q] = Seq(q196FuzzyJoin, q197Skyline, q198HybridRrf,
    q203LabelConfusion, q207FuzzyProbe, q210WalkCorpus,
    q211ContrastiveTriples)
}
