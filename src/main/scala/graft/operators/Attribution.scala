package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Conversion attribution over event streams — the marketing-analytics
  * classic: when a user converts, which earlier touch gets the credit?
  * Last-touch (the most recent non-conversion event inside a lookback
  * window) and first-touch (the user's earliest recorded touch) are
  * computed in the SAME pass; each conversion contributes one credit to
  * each model. A conversion with no prior touch inside the lookback is
  * unattributed and drops from both counts (the two models stay
  * comparable: same conversion denominator).
  *
  * Scale shape (100 TB): one user-keyed sort window over the event
  * stream (the W6 sessionization shape — user partitions bound the
  * sort), then two cell-bounded aggregates (|channels| rows). No
  * self-join: the naive per-conversion "find my latest prior touch"
  * formulation is a range self-join; the running `last(...) ignoreNulls`
  * window replaces it outright.
  */
object Attribution {

  /** Per channel: `last_touch` and `first_touch` conversion credits.
    * Deterministic order inside a user's stream is (tsCol, tieCol). */
  def attribute(
      events: DataFrame, userCol: String, tsCol: String,
      typeCol: String, tieCol: String,
      conversionType: String, lookbackDays: Int): DataFrame = {
    require(lookbackDays >= 1, s"lookbackDays must be >= 1")
    val w = Window.partitionBy(col(userCol))
      .orderBy(col(tsCol), col(tieCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val chan = when(col(typeCol) =!= conversionType, col(typeCol))
    val chanTs = when(col(typeCol) =!= conversionType, col(tsCol))
    val conv = events
      .withColumn("__lc", last(chan, ignoreNulls = true).over(w))
      .withColumn("__lts", last(chanTs, ignoreNulls = true).over(w))
      .withColumn("__fc", first(chan, ignoreNulls = true).over(w))
      .filter(col(typeCol) === conversionType &&
        col("__lts").isNotNull &&
        col("__lts") >= col(tsCol) - expr(s"INTERVAL $lookbackDays DAYS"))
    val lt = conv.groupBy(col("__lc").as("channel"))
      .agg(count(lit(1)).as("last_touch"))
    val ft = conv.groupBy(col("__fc").as("channel"))
      .agg(count(lit(1)).as("first_touch"))
    lt.join(ft, Seq("channel"), "full_outer")
      .select(col("channel"),
        coalesce(col("last_touch"), lit(0L)).as("last_touch"),
        coalesce(col("first_touch"), lit(0L)).as("first_touch"))
  }

  /** Linear (fractional) multi-touch attribution — the third classic:
    * every touch inside the conversion's lookback window shares the
    * conversion's one credit equally, 1/n each. This is a per-conversion
    * credit SPLIT the last/first shape cannot express: it needs the
    * window's touch COUNT and a division, not an endpoint pick.
    *
    * Window membership is BY TIMESTAMP — a RANGE window over unix
    * seconds, `[t − lookback, t]` inclusive — so the in-window state is
    * bounded by the lookback span, never the user's full history (the
    * 100 TB shape: `collect_list` holds at most one lookback's touches
    * per conversion; a rows-window carrying history would grow without
    * bound). Same-second touches are in lookback by definition, so no
    * tie column participates. Conversions with no lookback touch drop,
    * the same denominator rule as [[attribute]].
    *
    * Output `(channel, window_touches, touch_events, credit)`: one row
    * per (channel, lookback touch count n), where `touch_events` counts
    * the (conversion, touch) pairs and `credit = touch_events / n` —
    * the channel's summed fractional credit from conversions of that
    * window size, an exact ratio of two integers through ONE division
    * (the cross-engine bit-exactness discipline; per-channel totals are
    * one further `sum(credit)` for consumers who accept float addition).
    */
  def linear(
      events: DataFrame, userCol: String, tsCol: String,
      typeCol: String, conversionType: String,
      lookbackDays: Int): DataFrame = {
    require(lookbackDays >= 1, s"lookbackDays must be >= 1")
    val secs = lookbackDays * 86400L
    val w = Window.partitionBy(col(userCol))
      .orderBy(unix_timestamp(col(tsCol)))
      .rangeBetween(-secs, 0)
    // non-conversion events carry their channel; conversions (and the
    // current row itself) are null and collect_list skips them
    val chan = when(col(typeCol) =!= conversionType, col(typeCol))
    events
      .withColumn("__touches", collect_list(chan).over(w))
      .filter(col(typeCol) === conversionType &&
        size(col("__touches")) > 0)
      .select(explode(col("__touches")).as("channel"),
        size(col("__touches")).cast("long").as("window_touches"))
      .groupBy(col("channel"), col("window_touches"))
      .agg(count(lit(1)).as("touch_events"))
      .withColumn("credit",
        col("touch_events") / col("window_touches"))
  }
}
