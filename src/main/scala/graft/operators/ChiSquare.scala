package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact 2×2 chi-square test statistic — the A/B-experiment
  * independence check (does cohort membership move the conversion
  * rate?) with the engine's cross-engine determinism discipline.
  *
  * For the contingency table [[a, b], [c, d]] (group × outcome
  * counts), `χ² = N·(ad − bc)² / ((a+b)(c+d)(a+c)(b+d))`. The naive
  * `N·det²` numerator overflows 64-bit integers already at ~10⁵ rows
  * (det ≤ N²/4, so N·det² ≤ N⁵/16), so the EXACT outputs are the four
  * cells and `det = ad − bc` (a bigint up to N²/4 — safe to ~6·10⁹
  * rows), and the statistic itself is assembled in ONE FIXED
  * double-operation order
  * `((((det/r1) · (det/c1)) · n) / r0) / c0` — five IEEE steps that
  * replay bit-identically in any engine evaluating the same
  * expression tree, the q242 determinism recipe without any integer
  * blow-up. (Significance thresholds — χ²₁ at p=0.05 is 3.841 — are
  * the caller's constant; no erf/p-value tail is computed here.)
  *
  * Scale shape (100 TB of events): ONE map-side-combinable aggregate
  * with four conditional sums; nothing but the 4-cell table crosses
  * the wire. Any zero marginal → null statistic (degenerate
  * experiments are data, not exceptions).
  */
object ChiSquare {

  /** One-row frame: cells `n11 n10 n01 n00`, `n`, exact `det`
    * (= n11·n00 − n10·n01), and `chi2` (null when a marginal is
    * zero). */
  def test2x2(df: DataFrame, group: Column, outcome: Column): DataFrame = {
    def cell(g: Boolean, o: Boolean): Column =
      sum(when(group === lit(g) && outcome === lit(o), 1L)
        .otherwise(0L))
    val base = df.agg(
      cell(true, true).as("n11"), cell(true, false).as("n10"),
      cell(false, true).as("n01"), cell(false, false).as("n00"))
    base
      .select(
        col("n11"), col("n10"), col("n01"), col("n00"),
        (col("n11") + col("n10") + col("n01") + col("n00")).as("n"),
        (col("n11") * col("n00") - col("n10") * col("n01")).as("det"),
        (col("n11") + col("n10")).as("r1"),
        (col("n01") + col("n00")).as("r0"),
        (col("n11") + col("n01")).as("c1"),
        (col("n10") + col("n00")).as("c0"))
      .withColumn("chi2",
        when(col("r1") === 0L || col("r0") === 0L ||
          col("c1") === 0L || col("c0") === 0L,
          lit(null).cast("double"))
          .otherwise(
            col("det").cast("double") / col("r1")
              * (col("det").cast("double") / col("c1"))
              * col("n") / col("r0") / col("c0")))
      .drop("r1", "r0", "c1", "c0")
  }
}
