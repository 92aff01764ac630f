package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Robust per-group anomaly statistics — median and MAD (median
  * absolute deviation) with a `|x − median| > k·MAD` outlier gate: the
  * standard robust alternative to mean/stddev z-scores (one corrupted
  * batch shifts a mean arbitrarily but moves a median by at most one
  * rank — exactly the property a data-quality gate over ingested
  * metrics needs). For a training-data pipeline this is the numeric
  * twin of the text quality gate (q43/q147): flag metric rows whose
  * value is implausible RELATIVE to their own group before they enter
  * downstream aggregates.
  *
  * Exactness discipline: the median is the LOWER median by rank
  * selection — the value at `row_number = (n+1) div 2` in value order —
  * so it is an EXISTING data value chosen by integer arithmetic, never
  * an interpolated float (engines disagree on interpolation; they
  * cannot disagree on "the value at rank k"). Operating on integer
  * units (cents), the deviations, the MAD, and the `k·MAD` comparison
  * are all exact bigints, and every per-group output replays in any
  * SQL engine.
  *
  * Scale shape (100 TB): two rank windows partitioned by the group key
  * (values, then deviations) — the same single-shuffle-per-pass bound
  * as q147's quantile floor, with the per-group median tables joined
  * back by broadcast (bounded by #groups). The approx path for a
  * no-second-pass regime is `percentile_approx` (already gated via
  * q147's `approxThresholds`); this operator pins the exact semantics.
  * Group skew: one group's values sort on one task per pass — for a
  * pathological single-group corpus, pre-aggregate to (group, value,
  * count) first (the rank arithmetic lifts verbatim; distinct values
  * bound the sort).
  */
object RobustStats {

  /** Per-group lower median of `valCol` (a bigint column):
    * `(grpCol, n, median)`. */
  def groupMedian(
      df: DataFrame, grpCol: String, valCol: String,
      out: String = "median"): DataFrame = {
    val w = Window.partitionBy(col(grpCol)).orderBy(col(valCol))
    df.select(col(grpCol), col(valCol))
      .withColumn("__graft_rn", row_number().over(w))
      .withColumn("__graft_n",
        count(lit(1)).over(Window.partitionBy(col(grpCol))))
      .filter(col("__graft_rn") === floor((col("__graft_n") + 1) / 2))
      .select(col(grpCol), col("__graft_n").as("n"),
        col(valCol).as(out))
  }

  /** Per-group robust profile:
    * `(grpCol, n, median, mad, n_outliers, outlier_share)` where
    * `n_outliers` counts rows with `|value − median| > k·MAD` and
    * `outlier_share` is the one IEEE-exact double division. */
  def profile(
      df: DataFrame, grpCol: String, valCol: String,
      k: Int = 3): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val vals = df.select(col(grpCol), col(valCol))
    val med = groupMedian(vals, grpCol, valCol)
    val dev = vals.join(broadcast(med), Seq(grpCol))
      .withColumn("__graft_dev",
        abs(col(valCol) - col("median")))
    val mad = groupMedian(
      dev.select(col(grpCol), col("__graft_dev")),
      grpCol, "__graft_dev", out = "mad")
      .select(col(grpCol), col("mad"))
    dev.join(broadcast(mad), Seq(grpCol))
      .groupBy(col(grpCol), col("n"), col("median"), col("mad"))
      .agg(sum(when(col("__graft_dev") > lit(k.toLong) * col("mad"), 1L)
          .otherwise(0L)).as("n_outliers"))
      .withColumn("outlier_share",
        col("n_outliers").cast("double") / col("n").cast("double"))
      .select(col(grpCol), col("n"), col("median"), col("mad"),
        col("n_outliers"), col("outlier_share"))
  }

  /** The flagged rows themselves (for quarantine sinks): input columns
    * plus `median`, `mad`, `deviation`. */
  def outliers(
      df: DataFrame, grpCol: String, valCol: String,
      k: Int = 3): DataFrame = {
    val med = groupMedian(
      df.select(col(grpCol), col(valCol)), grpCol, valCol)
    val dev = df
      .join(broadcast(med.select(col(grpCol), col("median"))), Seq(grpCol))
      .withColumn("deviation", abs(col(valCol) - col("median")))
    val mad = groupMedian(
      dev.select(col(grpCol), col("deviation")),
      grpCol, "deviation", out = "mad")
      .select(col(grpCol), col("mad"))
    dev.join(broadcast(mad), Seq(grpCol))
      .filter(col("deviation") > lit(k.toLong) * col("mad"))
  }
}
