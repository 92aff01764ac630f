package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exponentially time-decayed activity scoring — the "current
  * popularity" aggregate (recency-weighted counts with a half-life)
  * that rankers and trending feeds use instead of raw lifetime counts.
  *
  * Determinism discipline: rows are bucketed by INTEGER day offset
  * from an anchor date; per (key, offset) counts are exact bigints,
  * and the decay weights `2^(−offset/halfLife)` are PRECOMPUTED
  * doubles applied in one fixed left-associative chain over the
  * pivoted offset columns (the [[RankingMetrics]] NDCG recipe — the
  * executors never call pow, and a float sum whose order depends on
  * hash-aggregation order never exists). Oracle SQL interpolates the
  * SAME constants as E-notation literals.
  *
  * Scale shape (100 TB of events): ONE map-side-combinable
  * conditional aggregate on the key — the shuffle carries
  * keys × horizon small columns, events never re-shuffle per day and
  * no per-day join plans. The horizon bounds the chain (≤ 64 terms
  * stays comfortably inside whole-stage codegen, the q248 evidence).
  */
object TimeDecay {

  /** `2^(−o/halfLifeDays)` for offsets o = 0..horizon−1 — the decay
    * weights as plan-time double constants. */
  def weights(horizonDays: Int, halfLifeDays: Double): Seq[Double] =
    (0 until horizonDays).map(o =>
      math.pow(2.0, -o.toDouble / halfLifeDays))

  /** Per-key decayed activity: `(key, n_events, decayed_score)` over
    * rows with day offset in [0, horizonDays) from `anchorDate`
    * (rows outside the horizon are excluded from BOTH outputs —
    * bounded-horizon semantics, the [[Bfs]] radius contract).
    *
    * @param anchorDate   ISO date string; offset = anchor − date(ts)
    * @param horizonDays  in [1, 64]
    * @param halfLifeDays decay half-life, > 0
    */
  def decayedCounts(
      df: DataFrame, key: Column, ts: Column, anchorDate: String,
      horizonDays: Int, halfLifeDays: Double): DataFrame = {
    require(horizonDays >= 1 && horizonDays <= 64,
      s"horizonDays must be in [1,64], got $horizonDays")
    require(halfLifeDays > 0.0,
      s"halfLifeDays must be positive, got $halfLifeDays")
    val w = weights(horizonDays, halfLifeDays)
    val bucketed = df
      .withColumn("__k", key)
      .withColumn("__o", datediff(to_date(lit(anchorDate)), to_date(ts)))
      .filter(col("__o") >= 0 && col("__o") < horizonDays)
    val cAt = (0 until horizonDays).map(o =>
      sum(when(col("__o") === o, 1L).otherwise(0L)).as(s"c$o"))
    val chain = (1 until horizonDays).foldLeft(
      col("c0") * lit(w.head)) {
      case (acc, o) => acc + col(s"c$o") * lit(w(o))
    }
    bucketed
      .groupBy(col("__k"))
      .agg(cAt.head, cAt.tail: _*)
      .select(col("__k").as("key") +:
        (0 until horizonDays).map(o => col(s"c$o")): _*)
      .withColumn("n_events",
        (0 until horizonDays).map(o => col(s"c$o"))
          .reduce(_ + _))
      .withColumn("decayed_score", chain)
      .select(col("key"), col("n_events"), col("decayed_score"))
  }
}
