package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic stratified sampling for corpus curation: exactly k rows
  * per stratum (language, source, quality band …), chosen by a
  * cross-engine-reproducible hash ranking rather than `rand()` — the same
  * md5-of-identity technique the playlist sampler uses (W10 / q79), so the
  * SAMPLED ROWS themselves are verifiable, not just their count.
  *
  * Why not `df.stat.sampleBy`: fraction-based sampling gives binomial
  * counts (±√n per stratum) and is seed-stable only within one engine.
  * Training-data recipes specify exact per-language budgets; hash-ranked
  * top-k delivers them exactly and reproducibly anywhere md5 exists.
  *
  * Scale: one window partitioned by the stratum — rank-filter plans with
  * WindowGroupLimit pushdown (per-partition top-k before the exchange), so
  * the shuffle carries at most k·strata surviving rows, not the corpus.
  * Skewed strata (one language dominating the corpus) cost only that
  * stratum's partition scan; the per-partition limit keeps its shuffle
  * contribution at k rows like everyone else's.
  */
object StratifiedSample {

  /** Exactly `min(k, |stratum|)` rows per stratum, ranked by
    * md5(identity). Adds `sample_rank` (1-based within the stratum). */
  def exactPerStratum(
      df: DataFrame, stratumCol: String, idCol: String, k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    require(!df.columns.contains("sample_rank"),
      "input already has a sample_rank column — rename it before sampling")
    val w = Window.partitionBy(col(stratumCol))
      .orderBy(md5(col(idCol).cast("string").cast("binary")), col(idCol))
    df.withColumn("sample_rank", row_number().over(w))
      .filter(col("sample_rank") <= k)
  }

  /** Per-stratum budgets: like [[exactPerStratum]] but k varies by
    * stratum (the "2× French, 0.5× code" recipe shape). `budgets` is
    * broadcast — it is a config-sized map, not data. */
  def budgeted(
      df: DataFrame, stratumCol: String, idCol: String,
      budgets: Map[String, Int]): DataFrame = {
    require(budgets.nonEmpty, "budgets must not be empty")
    require(budgets.values.forall(_ >= 0), "budgets must be non-negative")
    val reserved = Seq("sample_rank", "__budget").filter(df.columns.contains)
    require(reserved.isEmpty,
      s"input already has output column(s) ${reserved.mkString(", ")} — " +
        "rename them before sampling")
    val spark = df.sparkSession
    import spark.implicits._
    val b = broadcast(budgets.toSeq.toDF(stratumCol, "__budget"))
    val w = Window.partitionBy(col(stratumCol))
      .orderBy(md5(col(idCol).cast("string").cast("binary")), col(idCol))
    df.join(b, Seq(stratumCol)) // inner: strata without a budget drop out
      .withColumn("sample_rank", row_number().over(w))
      .filter(col("sample_rank") <= col("__budget"))
      .drop("__budget")
  }

  /** Deterministic WEIGHTED sampling by hash tickets: row i holds
    * `weight_i` tickets (an integer column, clamped to [1, maxTickets]),
    * every ticket draws the uniform value `md5(id ":" ticket ":" salt)`,
    * and the row's key is its MINIMUM draw — so the probability that a
    * row holds the globally smallest ticket is exactly weight_i / Σw,
    * and taking the k smallest row-minima yields a weight-biased,
    * fully reproducible sample (same salt → same sample on any engine
    * with md5; the q79 determinism discipline extended to weights).
    *
    * Scale shape: the explode is bounded by Σ min(weight, maxTickets) —
    * maxTickets caps the blow-up explicitly — and the per-row min is a
    * map-side-combinable aggregate; the global top-k is a
    * TakeOrderedAndProject (k rows per partition forwarded). Adds
    * `ticket_min` (the winning draw) and `sample_rank` (1-based). */
  def weightedByTickets(
      df: DataFrame, idCol: String, weightCol: Column, k: Int,
      salt: String, maxTickets: Int = 64): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    require(maxTickets >= 1 && maxTickets <= 4096,
      s"maxTickets must be in [1,4096], got $maxTickets")
    val reserved = Seq("ticket_min", "sample_rank", "__t")
      .filter(df.columns.contains)
    require(reserved.isEmpty,
      s"input already has output column(s) ${reserved.mkString(", ")} — " +
        "rename them before sampling")
    val tickets = greatest(least(weightCol.cast("int"), lit(maxTickets)),
      lit(1))
    val mins = df
      .select(col(idCol),
        explode(sequence(lit(1), tickets)).as("__t"))
      .select(col(idCol),
        md5(concat(col(idCol).cast("string"), lit(":"), col("__t"),
          lit(":" + salt)).cast("binary")).as("__draw"))
      .groupBy(col(idCol))
      .agg(min(col("__draw")).as("ticket_min"))
      .orderBy(col("ticket_min"), col(idCol))
      .limit(k)
      .withColumn("sample_rank", row_number().over(
        Window.orderBy(col("ticket_min"), col(idCol))))
    df.join(mins, Seq(idCol))
  }
}
