package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact ranking-quality metrics for recommender evaluation — NDCG@k
  * and the hit-based family (precision@k, recall@k, reciprocal rank)
  * per query, computed distributed with ONE exchange on the query key.
  *
  * Cross-engine exactness: gains are small integers; the only floats
  * are (a) the discount weights `1/log2(i+1)`, PRECOMPUTED in Scala as
  * doubles and emitted as shortest-round-trip literals into BOTH the
  * Spark plan and any oracle SQL (the [[RandomProjection]] /
  * [[Bootstrap]] constant discipline — the executors never call log),
  * and (b) one fixed left-associative multiply-add chain of ≤ k terms
  * per query, which IEEE-replays bit-identically in any engine
  * evaluating the same expression text. Division only at the very end
  * (ndcg = dcg/idcg, precision = hits/k — the ratio-of-integers
  * discipline where possible).
  *
  * Scale shape (100 TB of scored candidates): rank assignment is two
  * `row_number` windows SHARING one partitioning on the query key —
  * Catalyst plans a single exchange with two partition-local sorts —
  * followed by one map-side-combinable conditional aggregate whose
  * shuffle carries (queries × 2k) small columns; the candidate corpus
  * is never globally sorted and no per-query data structure leaves the
  * executors. Reference analogue: ranking evaluation over the
  * recommender's scored candidates (recommend.py post-scoring), done
  * driver-side at sample scale there.
  */
object RankingMetrics {

  /** `1/log2(i+1)` for ranks i = 1..k — the NDCG discount weights as
    * plan-time double constants (shortest-round-trip strings of these
    * exact doubles belong in oracle SQL). */
  def dcgWeights(k: Int): Seq[Double] =
    (1 to k).map(i => 1.0 / (math.log(i + 1.0) / math.log(2.0)))

  /** Per-query NDCG@k: `(query, dcg, idcg, ndcg)`.
    *
    * System order is `order` (must be a deterministic total order
    * within a query — include a tiebreak id); ideal order is gain
    * descending, tie-broken by the same `order`. Queries whose items
    * all have zero gain get `ndcg = null` (no relevant items —
    * excluded-by-convention, not a divide-by-zero artifact).
    *
    * @param gain non-negative integer relevance gain column (callers
    *             wanting graded relevance pass `pow(2,rel)-1` already
    *             materialized as an integer)
    * @param order sort expressions over `df`'s columns (`.desc`
    *              allowed) defining the system ranking within a query
    */
  def ndcgAtK(
      df: DataFrame, query: Column, gain: Column, order: Seq[Column],
      k: Int): DataFrame = {
    require(k >= 1 && k <= 64, s"need 1 <= k <= 64, got $k")
    val w = dcgWeights(k)
    val withKeys = df.withColumn("q", query)
      .withColumn("g", gain.cast("long"))
    val byQ = Window.partitionBy(col("q"))
    val ranked = withKeys
      .withColumn("rs", row_number().over(byQ.orderBy(order: _*)))
      .withColumn("ri", row_number().over(
        byQ.orderBy(col("g").desc +: order: _*)))
    val gAt = (1 to k).map(i =>
      coalesce(max(when(col("rs") === i, col("g"))), lit(0L))
        .as(s"g$i"))
    val hAt = (1 to k).map(i =>
      coalesce(max(when(col("ri") === i, col("g"))), lit(0L))
        .as(s"h$i"))
    def chain(prefix: String): Column =
      (2 to k).foldLeft(col(s"${prefix}1") * lit(w.head)) {
        case (acc, i) => acc + col(s"$prefix$i") * lit(w(i - 1))
      }
    ranked
      .groupBy(col("q"))
      .agg(gAt.head, (gAt.tail ++ hAt): _*)
      .select(col("q").as("query"), chain("g").as("dcg"),
        chain("h").as("idcg"))
      .withColumn("ndcg",
        when(col("idcg") === 0.0, lit(null).cast("double"))
          .otherwise(col("dcg") / col("idcg")))
  }

  /** Per-query hit metrics at cutoff k: `(query, n_rel, hits_at_k,
    * precision_at_k, recall_at_k, first_hit_rank, reciprocal_rank)`.
    *
    * `rel` is a boolean relevance column; ranks come from `order` as
    * in [[ndcgAtK]]. `recall_at_k` and `reciprocal_rank` are null for
    * queries with no relevant items; `first_hit_rank` is null when no
    * relevant item exists. All ratios are one IEEE division of exact
    * bigints. */
  def hitsAtK(
      df: DataFrame, query: Column, rel: Column, order: Seq[Column],
      k: Int): DataFrame = {
    require(k >= 1, s"need k >= 1, got $k")
    val ranked = df.withColumn("q", query)
      .withColumn("r", rel.cast("boolean"))
      .withColumn("rs", row_number().over(
        Window.partitionBy(col("q")).orderBy(order: _*)))
    ranked
      .groupBy(col("q"))
      .agg(
        sum(when(col("r"), 1L).otherwise(0L)).as("n_rel"),
        sum(when(col("r") && col("rs") <= k, 1L).otherwise(0L))
          .as("hits_at_k"),
        min(when(col("r"), col("rs").cast("long"))).as("first_hit_rank"))
      .select(col("q").as("query"), col("n_rel"), col("hits_at_k"),
        (col("hits_at_k") / lit(k.toLong)).as("precision_at_k"),
        when(col("n_rel") === 0L, lit(null).cast("double"))
          .otherwise(col("hits_at_k") / col("n_rel")).as("recall_at_k"),
        col("first_hit_rank"),
        (lit(1.0) / col("first_hit_rank")).as("reciprocal_rank"))
  }
}
