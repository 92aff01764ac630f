package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Interval sweep-line analytics — peak concurrency over a set of
  * time intervals: how many sessions/streams/jobs were active AT ONCE,
  * and when the maximum first occurred. The load-sizing question every
  * serving and capacity plan starts from, and the classic algorithm
  * for it: explode each interval into a `+1` breakpoint at its start
  * and a `−1` at its end, order ALL breakpoints globally, and take the
  * maximum of the running sum.
  *
  * The global running sum is the scale-hostile part — a bare
  * `Window.orderBy` puts the whole corpus in one task. Here it runs on
  * [[PrefixSum.runningTotal]]: one range exchange, per-partition
  * parallel sorts, #partitions-bounded offset cumulation — the sweep
  * stays distributed at any interval count. Breakpoint order is the
  * strict total order `(t, kind, keys…)` with starts (kind 0) before
  * ends (kind 1) at equal instants, so touching intervals count as
  * concurrent — inclusive `[start, end]` semantics, deterministic
  * everywhere.
  */
object Sweep {

  /** Gap-based sessions per key: `(keyCol, session_id, s_start, s_end)`
    * — a new session opens when the gap to the previous event exceeds
    * `gapSeconds` (exact microsecond comparison); events ordered by
    * `(tsCol, tieCol)` per key, one key-partitioned window sort. */
  def sessions(
      events: DataFrame, keyCol: String, tsCol: String, tieCol: String,
      gapSeconds: Long): DataFrame = {
    val wOrd = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol), col(tieCol))
    events
      .withColumn("__graft_us", unix_micros(col(tsCol)))
      .withColumn("__graft_new",
        when(col("__graft_us") - lag(col("__graft_us"), 1).over(wOrd) >
          gapSeconds * 1000000L, 1L).otherwise(0L))
      .withColumn("session_id", sum(col("__graft_new"))
        .over(wOrd.rowsBetween(Window.unboundedPreceding,
          Window.currentRow)))
      .groupBy(col(keyCol), col("session_id"))
      .agg(min(col(tsCol)).as("s_start"), max(col(tsCol)).as("s_end"))
  }

  /** Peak concurrency over inclusive `[startCol, endCol]` intervals:
    * ONE row `(peak, first_peak_ts, n_intervals)`. `keyCols` must make
    * each interval unique (they complete the sweep's strict breakpoint
    * order). */
  def peakConcurrency(
      intervals: DataFrame, startCol: String, endCol: String,
      keyCols: Seq[String], partitions: Int = 32): DataFrame = {
    require(keyCols.nonEmpty, "keyCols must be non-empty")
    val ks = keyCols.map(col)
    val starts = intervals.select(col(startCol).as("t") +:
      lit(0).as("__graft_kind") +: lit(1L).as("__graft_delta") +: ks: _*)
    val ends = intervals.select(col(endCol).as("t") +:
      lit(1).as("__graft_kind") +: lit(-1L).as("__graft_delta") +: ks: _*)
    val run = PrefixSum.runningTotal(
      starts.unionAll(ends),
      col("t") +: col("__graft_kind") +: ks,
      col("__graft_delta"), out = "concurrency", partitions = partitions)
    val n = intervals.count()
    val peak = run.agg(max(col("concurrency")).as("peak"))
    run.join(broadcast(peak), col("concurrency") === col("peak"))
      .groupBy(col("peak"))
      .agg(min(col("t")).as("first_peak_ts"))
      .select(col("peak"), col("first_peak_ts"),
        lit(n).as("n_intervals"))
  }
}
