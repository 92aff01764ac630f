package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact per-key least-squares daily trend — "is this item rising or
  * fading" as the OLS slope of the daily count series over a FIXED
  * day window, with R² as the trend-strength gate. The regression-
  * flavored member of the statistics family ([[Correlation]] is the
  * symmetric association; this is y-on-t with a fixed design).
  *
  * Exactness: the day index is a bounded integer design, so Σt and
  * Σt² are CLOSED-FORM constants (D days: St = D(D−1)/2,
  * Stt = (D−1)D(2D−1)/6) and the corpus contributes only exact
  * bigints per key — Σy, Σt·y, Σy² over the daily counts, where
  * zero-event days contribute exactly 0 to every sum and D keeps
  * counting them in the design (no zero-fill join is ever needed).
  * slope_num = D·Σty − St·Σy stays bigint; slope, intercept, and
  * R² = num²/(den·(D·Σy²−Σy²)) are fixed IEEE steps over
  * once-cast doubles (the [[ChiSquare]] recipe — the int64-blowing
  * num² product is never formed as an integer).
  *
  * Scale shape (100 TB of events): two map-side-combinable hash
  * aggregates — (key, day) then key — so the shuffle carries
  * keys × observed-days rows, then keys; no window, no sort, no
  * zero-fill densification join.
  */
object TrendOls {

  /** Per-key `(key, sy, sty, syy, slope_num, slope, intercept, r2)`
    * over day offsets 0..days−1 from `anchorDate` (rows outside the
    * window are excluded; days without rows are y = 0 design points).
    * `r2` is null for a constant series (zero variance).
    *
    * @param days window length D, in [2, 3650]
    */
  def dailyTrend(
      df: DataFrame, key: Column, ts: Column, anchorDate: String,
      days: Int): DataFrame = {
    require(days >= 2 && days <= 3650,
      s"days must be in [2,3650], got $days")
    val d = days.toLong
    val st = d * (d - 1) / 2
    val stt = (d - 1) * d * (2 * d - 1) / 6
    val den = d * stt - st * st
    val daily = df
      .withColumn("__k", key)
      .withColumn("__o",
        datediff(to_date(ts), to_date(lit(anchorDate))).cast("long"))
      .filter(col("__o") >= 0L && col("__o") < d)
      .groupBy(col("__k"), col("__o"))
      .agg(count(lit(1)).as("cnt"))
    daily
      .groupBy(col("__k"))
      .agg(
        sum(col("cnt")).as("sy"),
        sum(col("__o") * col("cnt")).as("sty"),
        sum(col("cnt") * col("cnt")).as("syy"))
      .withColumn("slope_num", lit(d) * col("sty") - lit(st) * col("sy"))
      .withColumn("vy_n", lit(d) * col("syy") - col("sy") * col("sy"))
      .withColumn("slope", col("slope_num").cast("double") / lit(den))
      .withColumn("intercept",
        (col("sy").cast("double") - col("slope") * lit(st)) / lit(d))
      .withColumn("r2",
        when(col("vy_n") === 0L, lit(null).cast("double"))
          .otherwise(col("slope_num").cast("double") * col("slope_num")
            / (lit(den.toDouble) * col("vy_n"))))
      .select(col("__k").as("key"), col("sy"), col("sty"), col("syy"),
        col("slope_num"), col("slope"), col("intercept"), col("r2"))
  }
}
