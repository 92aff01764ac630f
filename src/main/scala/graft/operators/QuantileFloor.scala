package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-group quantile threshold calibration — the two-pass shape behind
  * every "drop the worst X% per language" corpus filter: pass 1 computes
  * each group's q-th discrete percentile of a score, pass 2 filters the
  * corpus against its group's threshold. Thresholds are one row per
  * group, so the second pass is a broadcast join — the corpus itself is
  * scanned, never shuffled.
  *
  * The exact path aggregates a (group, score) HISTOGRAM first — a hash
  * agg with map-side combine, so the shuffle carries one row per
  * distinct score value — and walks its cumulative counts to the
  * discrete percentile (min score with cum ≥ ceil(q·n)). The rank
  * window therefore sees histogram rows, never corpus rows: with few
  * groups (languages) a per-ROW rank window would funnel each group's
  * entire corpus through one task — fewer groups means WORSE skew —
  * while the histogram form is bounded by score cardinality. When the
  * score is high-cardinality (continuous), [[approxThresholds]] swaps
  * in percentile_approx — a mergeable sketch whose partials combine
  * map-side, so the exchange carries sketches; its error bound is
  * spec'd against the exact path.
  */
object QuantileFloor {

  /** One row per group: (group, threshold) where threshold is the
    * discrete q-th percentile of `scoreCol` — the value at position
    * ceil(q·n) in score order, computed as the least score whose
    * cumulative histogram count reaches that position (tie-independent,
    * cross-engine replayable). */
  def thresholds(
      df: DataFrame, groupCol: String, scoreCol: String,
      q: Double): DataFrame = {
    require(q > 0 && q < 1, s"quantile must be in (0,1), got $q")
    val hist = df.groupBy(col(groupCol), col(scoreCol))
      .agg(count(lit(1)).as("cnt"))
    hist
      .withColumn("cum", sum(col("cnt")).over(
        Window.partitionBy(col(groupCol)).orderBy(col(scoreCol))))
      .withColumn("n", sum(col("cnt")).over(
        Window.partitionBy(col(groupCol))))
      .filter(col("cum") >= ceil(lit(q) * col("n")))
      .groupBy(col(groupCol)).agg(min(col(scoreCol)).as("threshold"))
  }

  /** Sketch-path thresholds: percentile_approx per group. `accuracy`
    * trades memory for error (1/accuracy relative rank error). */
  def approxThresholds(
      df: DataFrame, groupCol: String, scoreCol: String,
      q: Double, accuracy: Int = 10000): DataFrame =
    df.groupBy(col(groupCol))
      .agg(percentile_approx(col(scoreCol), lit(q), lit(accuracy))
        .as("threshold"))

  /** The filter pass: keep rows whose score is at or above their group's
    * threshold. `thr` is tiny (one row per group) → broadcast. */
  def applyFloor(
      df: DataFrame, thr: DataFrame, groupCol: String,
      scoreCol: String): DataFrame =
    df.join(broadcast(thr), Seq(groupCol))
      .filter(col(scoreCol) >= col("threshold"))
}
