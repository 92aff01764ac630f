package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Welch's unequal-variance two-sample t-test — the A/B-experiment
  * mean comparison for a *numeric* outcome, beside [[ChiSquare]]'s
  * rate comparison and [[KsTest]]'s whole-distribution drift check.
  *
  * Determinism discipline: the corpus contributes only SIX exact
  * bigints — per group the count, Σx, and Σx² of an integer-valued
  * outcome (snap money to cents first). Mean, variance, the t
  * statistic, and the Welch–Satterthwaite degrees of freedom are then
  * a FIXED tree of IEEE double steps over those bigints (the
  * [[ChiSquare]] recipe) — any engine evaluating the same expression
  * tree replays them bit-identically, and the float-summation-order
  * ambiguity of a naive `avg`/`var_samp` over doubles never appears.
  * Integer envelope: Σx² stays exact to 2⁶³, i.e. ~10¹² rows of
  * 3-digit outcomes or ~10⁸ rows of 5-digit cents; beyond that, snap
  * to a coarser unit (the statistic is location/scale-invariant in
  * the unit) or sum into decimal(38,0).
  *
  * Scale shape (100 TB of observations): ONE map-side-combinable
  * conditional aggregate; a single 6-long row crosses the wire. No
  * sort, no window, no second pass (the textbook two-pass mean-then-
  * deviation formulation is exactly the extra corpus scan this
  * sufficient-statistics form removes).
  */
object Welch {

  /** One-row frame: per-group exact `n1 n0 sum1 sum0 ss1 ss0`
    * (bigint), then `mean1 mean0 var1 var0 se2 t df_welch` as fixed
    * IEEE steps. `t`/`df_welch` are null when either group has fewer
    * than 2 rows or when both sample variances are zero (degenerate
    * experiments are data, not exceptions).
    *
    * @param group boolean column — true = treatment, false = control
    * @param value integer-valued outcome column
    */
  def tTest(df: DataFrame, group: Column, value: Column): DataFrame =
    tTestBy(df.withColumn("__seg", lit(0L)), col("__seg"), group, value)
      .drop("segment")

  /** [[tTest]] per segment — the metric-regression SWEEP (one t per
    * market/cohort/experiment cell, thousands at once): the same six
    * exact bigints per segment through ONE map-side-combinable
    * aggregate keyed on the segment; the shuffle carries
    * segments × 6 longs. A per-segment loop of scalar tests — the
    * driver-side anti-pattern — never appears. */
  def tTestBy(
      df: DataFrame, segment: Column, group: Column,
      value: Column): DataFrame = {
    val x = value.cast("long")
    def side(g: Boolean, c: Column): Column =
      sum(when(group === lit(g), c).otherwise(0L))
    val base = df.groupBy(segment.as("segment")).agg(
      side(true, lit(1L)).as("n1"), side(false, lit(1L)).as("n0"),
      side(true, x).as("sum1"), side(false, x).as("sum0"),
      side(true, x * x).as("ss1"), side(false, x * x).as("ss0"))
    def variance(n: Column, s: Column, q: Column): Column =
      (q.cast("double") - s.cast("double") * s / n) / (n - lit(1L))
    base
      .withColumn("mean1", col("sum1").cast("double") / col("n1"))
      .withColumn("mean0", col("sum0").cast("double") / col("n0"))
      .withColumn("var1",
        when(col("n1") < 2L, lit(null).cast("double"))
          .otherwise(variance(col("n1"), col("sum1"), col("ss1"))))
      .withColumn("var0",
        when(col("n0") < 2L, lit(null).cast("double"))
          .otherwise(variance(col("n0"), col("sum0"), col("ss0"))))
      .withColumn("se2",
        col("var1") / col("n1") + col("var0") / col("n0"))
      .withColumn("t",
        when(col("se2").isNull || col("se2") === 0.0,
          lit(null).cast("double"))
          .otherwise((col("mean1") - col("mean0")) / sqrt(col("se2"))))
      .withColumn("df_welch",
        when(col("se2").isNull || col("se2") === 0.0,
          lit(null).cast("double"))
          .otherwise(
            col("se2") * col("se2") /
              (col("var1") / col("n1") * (col("var1") / col("n1"))
                / (col("n1") - lit(1L)) +
                col("var0") / col("n0") * (col("var0") / col("n0"))
                  / (col("n0") - lit(1L)))))
  }
}
