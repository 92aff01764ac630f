package graft.queries

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.operators.Funnel

/** Funnel fold: strict ordering, same-timestamp ties, partial funnels,
  * no-step users, guards. */
class FunnelSpec extends SparkSpec {

  private def ev(rows: (Long, String, String)*) = {
    import spark.implicits._
    rows.toDF("user_id", "event_type", "ts_s")
      .withColumn("ts", col("ts_s").cast("timestamp")).drop("ts_s")
  }

  private val steps = Seq("view", "click", "purchase")

  private def run(df: org.apache.spark.sql.DataFrame) =
    Funnel.completions(df, "user_id", "event_type", "ts", steps)
      .collect().map(r => r.getLong(0) ->
        ((1 to 3).map(i => Option(r.getTimestamp(i))
          .map(_.toString.stripSuffix(".0"))), r.getLong(4))).toMap

  test("strict sequence: later steps need strictly later events") {
    val got = run(ev(
      // user 1: completes all three in order
      (1L, "view", "2024-01-01 10:00:00"),
      (1L, "click", "2024-01-01 11:00:00"),
      (1L, "purchase", "2024-01-01 12:00:00"),
      // user 2: purchase BEFORE click — funnel stops at click
      (2L, "view", "2024-01-01 10:00:00"),
      (2L, "purchase", "2024-01-01 10:30:00"),
      (2L, "click", "2024-01-01 11:00:00"),
      // user 3: click only — step 1 never happens, nothing counts
      (3L, "click", "2024-01-01 09:00:00")))
    assert(got(1L)._2 == 3L)
    assert(got(1L)._1 == Seq(Some("2024-01-01 10:00:00"),
      Some("2024-01-01 11:00:00"), Some("2024-01-01 12:00:00")))
    assert(got(2L)._2 == 2L)
    assert(got(3L)._2 == 0L && got(3L)._1.forall(_.isEmpty))
  }

  test("completion times are minima; same-timestamp events do not chain") {
    val got = run(ev(
      // two views: the EARLIEST opens the funnel, so the 10:30 click lands
      (4L, "view", "2024-01-01 10:00:00"),
      (4L, "view", "2024-01-01 11:00:00"),
      (4L, "click", "2024-01-01 10:30:00"),
      // user 5: click at the same instant as view — strict > rejects it
      (5L, "view", "2024-01-01 10:00:00"),
      (5L, "click", "2024-01-01 10:00:00")))
    assert(got(4L)._1(0) == Some("2024-01-01 10:00:00"))
    assert(got(4L)._1(1) == Some("2024-01-01 10:30:00"))
    assert(got(5L)._2 == 1L, "same-instant click must not count")
  }

  test("events of non-step types are ignored; guards reject bad steps") {
    val df = ev((6L, "view", "2024-01-01 10:00:00"),
      (6L, "error", "2024-01-01 10:30:00"),
      (6L, "click", "2024-01-01 11:00:00"))
    val got = Funnel.completions(df, "user_id", "event_type", "ts", steps)
      .select("steps_completed").collect().map(_.getLong(0))
    assert(got.sameElements(Array(2L)))
    intercept[IllegalArgumentException](
      Funnel.completions(df, "user_id", "event_type", "ts", Seq.empty))
    intercept[IllegalArgumentException](
      Funnel.completions(df, "user_id", "event_type", "ts",
        Seq("view", "view")))
  }
}
