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
  * The exact path uses a rank window (value at row ceil(q·n), the
  * discrete percentile — deterministic, tie-stable, cross-engine
  * replayable); pass 1 does shuffle on the group key, which is fine
  * while groups are few (languages, sources). When even pass 1 must not
  * shuffle the corpus, [[approxThresholds]] swaps in percentile_approx —
  * a t-digest-style mergeable sketch whose partials combine map-side, so
  * the exchange carries sketches, not rows; its error bound is spec'd
  * against the exact path.
  */
object QuantileFloor {

  /** One row per group: (group, threshold) where threshold is the
    * discrete q-th percentile of `scoreCol` (value at row ceil(q·n) in
    * (score, tiebreak) order). */
  def thresholds(
      df: DataFrame, groupCol: String, scoreCol: String,
      tieCol: String, q: Double): DataFrame = {
    require(q > 0 && q < 1, s"quantile must be in (0,1), got $q")
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col(scoreCol), col(tieCol))
    df.select(col(groupCol), col(scoreCol), col(tieCol))
      .withColumn("rn", row_number().over(w))
      .withColumn("n", count(lit(1)).over(Window.partitionBy(col(groupCol))))
      .filter(col("rn") === ceil(lit(q) * col("n")))
      .select(col(groupCol), col(scoreCol).as("threshold"))
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
