package graft.queries

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.dedup.{MinHash, SimHash}
import graft.multimodal.Media
import graft.recs.Als
import graft.similarity.UserCosine

/** Training-data-pipeline queries wrapping the dedup / multimodal / recs
  * library modules. MinHash/SimHash/ALS/media rely on engine-specific
  * hashing or ML training, so they are rows-only checked here (no portable
  * SQL oracle) — their semantics are unit-tested with planted fixtures in
  * the ScalaTest specs instead. q81 (exact user cosine) is fully
  * oracle-verified.
  */
object PipelineQueries {

  // ---------------------------------------------------------------- q46
  /** MinHash+LSH near-dup candidates over documents, exact-verified.
    * Random-vocab synthetic docs rarely clear a high threshold, so the
    * query reports the verified-pair distribution at a low one; planted
    * duplicate tests live in DedupSpec. */
  val q46MinhashNeardup = Q(
    "q46_minhash_neardup",
    (s, d) => MinHash.nearDuplicates(
        Tables.documents(s, d), "doc_id", "text",
        shingleLen = 3, numPerms = 32, bands = 8, threshold = 0.3)
      .orderBy(col("id_a"), col("id_b")),
    oracle = None,
    bench = true)

  // ---------------------------------------------------------------- q47
  /** SimHash fingerprint near-dup pairs (Hamming <= 16 over 64-bit
    * token-vote fingerprints; loose bound so the synthetic corpus yields
    * pairs). */
  val q47SimhashNeardup = Q(
    "q47_simhash_neardup",
    (s, d) => {
      // pigeonhole blocking needs maxHamming+1 blocks; with a loose bound
      // use 4 blocks of 16 bits and post-filter
      val fps = SimHash.fingerprints(Tables.documents(s, d), "doc_id", "text")
      val pairs = SimHash.nearDuplicates(
        Tables.documents(s, d), "doc_id", "text", maxHamming = 3)
      fps.agg(count(lit(1)).as("n_docs"),
          countDistinct(col("simhash")).as("n_distinct_fp"))
        .crossJoin(pairs.agg(count(lit(1)).as("n_near_pairs")))
    },
    oracle = None)

  // ---------------------------------------------------------------- q48
  /** Document fingerprinting: minhash signature prefix + simhash per doc —
    * the compact sketch a pipeline persists per document. */
  val q48Fingerprints = Q(
    "q48_fingerprints",
    (s, d) => {
      val docs = Tables.documents(s, d)
      val sh = MinHash.shingles(docs, "doc_id", "text", k = 3)
      val sigs = MinHash.signatures(sh, "doc_id", numPerms = 4)
      val simf = SimHash.fingerprints(docs, "doc_id", "text")
      sigs.join(simf, Seq("doc_id")).orderBy(col("doc_id"))
    },
    oracle = None)

  // ---------------------------------------------------------------- q60
  /** Multimodal plumbing: binary payload column + typed metadata through a
    * partition-local (stub-)decode into a columnar feature frame. */
  val q60MediaFeatures = Q(
    "q60_media_features",
    (s, d) => {
      val feats = Media.extractFeatures(
        Media.fromDocuments(Tables.documents(s, d)))
      feats.toDF()
        .groupBy(col("media_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("byte_len")).as("total_bytes"),
          countDistinct(col("payload_hash")).as("n_distinct_payloads"))
        .orderBy(col("media_type"))
    },
    oracle = None)

  // ---------------------------------------------------------------- q80
  /** ALS end-to-end on (customer × part) purchase counts from lineitem ⋈
    * orders: dense-id assignment, confidence transform, implicit-prefs
    * training, top-5 recommendations per user. Seeded but
    * ML-training-dependent → rows-only check. */
  val q80AlsRecommend = Q(
    "q80_als_recommend",
    (s, d) => {
      val purchases = Tables.lineitem(s, d)
        .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .select(col("o_custkey"), col("l_partkey"))
      val pc = Als.buildPlaycounts(purchases, "o_custkey", "l_partkey")
      val model = Als.train(pc, rank = 8, maxIter = 5)
      Als.recommend(model, pc.filter(col("als_user_id") < 500), k = 5)
        .orderBy(col("als_user_id"), col("rank"))
    },
    oracle = None)

  // ---------------------------------------------------------------- q81
  /** Exact user–user cosine over event-type play vectors: integer dot
    * products, one sqrt at the end — fully oracle-verified. */
  val q81UserCosine = Q(
    "q81_user_cosine",
    (s, d) => UserCosine.exact(
        Tables.events(s, d), "user_id", "event_type", minCosine = 0.9)
      .orderBy(col("u1"), col("u2")),
    Some("""WITH counts AS (
        SELECT user_id AS u, event_type AS it, count(*) AS c FROM events
        GROUP BY 1, 2),
      norms AS (SELECT u, sum(c * c) AS norm2 FROM counts GROUP BY 1),
      dots AS (
        SELECT a.u AS u1, b.u AS u2, sum(a.c * b.c) AS dot
        FROM counts a JOIN counts b ON a.it = b.it AND a.u < b.u
        GROUP BY 1, 2)
      SELECT u1, u2, cast(dot as bigint) AS dot,
        round(dot / sqrt(cast(n1.norm2 * n2.norm2 AS double)), 6) AS cosine_r
      FROM dots
      JOIN norms n1 ON u1 = n1.u JOIN norms n2 ON u2 = n2.u
      WHERE dot / sqrt(cast(n1.norm2 * n2.norm2 AS double)) >= 0.9
      ORDER BY u1, u2"""),
    bench = true)

  val all: Seq[Q] = Seq(
    q46MinhashNeardup, q47SimhashNeardup, q48Fingerprints,
    q60MediaFeatures, q80AlsRecommend, q81UserCosine)
}
