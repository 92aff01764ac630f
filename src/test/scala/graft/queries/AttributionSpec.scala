package graft.queries

import graft.SparkSpec
import graft.operators.Attribution

class AttributionSpec extends SparkSpec {
  import spark.implicits._

  private def run(rows: Seq[(Long, String, String, Long)], days: Int = 7) =
    Attribution.attribute(
        rows.map { case (u, ty, at, id) => (u, ts(at), ty, id) }
          .toDF("user_id", "ts", "event_type", "event_id"),
        "user_id", "ts", "event_type", "event_id", "purchase", days)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap

  test("last touch takes the nearest prior channel, first touch the " +
    "earliest; both models share the conversion denominator") {
    val got = run(Seq(
      (1L, "view", "2024-01-01 10:00:00", 1L),
      (1L, "click", "2024-01-02 10:00:00", 2L),
      (1L, "purchase", "2024-01-03 10:00:00", 3L),
      (2L, "click", "2024-02-01 09:00:00", 4L),
      (2L, "purchase", "2024-02-01 10:00:00", 5L)))
    // user1: last=click, first=view; user2: last=first=click
    assert(got === Map("click" -> ((2L, 1L)), "view" -> ((0L, 1L))))
  }

  test("conversions outside the lookback, or with no prior touch, drop " +
    "from BOTH models") {
    val got = run(Seq(
      (1L, "view", "2024-01-01 10:00:00", 1L),
      (1L, "purchase", "2024-01-20 10:00:00", 2L), // touch 19 days old
      (2L, "purchase", "2024-03-01 10:00:00", 3L), // no touch at all
      (3L, "click", "2024-04-01 10:00:00", 4L),
      (3L, "purchase", "2024-04-02 10:00:00", 5L)))
    assert(got === Map("click" -> ((1L, 1L))))
  }

  test("a purchase between touches does not become a channel; equal " +
    "timestamps break by event id") {
    val got = run(Seq(
      (1L, "view", "2024-01-01 10:00:00", 1L),
      (1L, "purchase", "2024-01-02 10:00:00", 2L),
      (1L, "click", "2024-01-02 10:00:00", 3L), // same ts as purchase,
      (1L, "purchase", "2024-01-03 10:00:00", 4L))) // later id → after it
    // conv#2: last=view; conv#4: last=click, first=view for both
    assert(got === Map("view" -> ((1L, 2L)), "click" -> ((1L, 0L))))
  }

  private def runLinear(
      rows: Seq[(Long, String, String, Long)], days: Int = 7) =
    Attribution.linear(
        rows.map { case (u, ty, at, id) => (u, ts(at), ty, id) }
          .toDF("user_id", "ts", "event_type", "event_id"),
        "user_id", "ts", "event_type", "purchase", days)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getDouble(3)))
      .toMap

  test("linear splits one credit equally across lookback touches — " +
    "exact fractional credits, boundary and same-second touches in") {
    val got = runLinear(Seq(
      // user 1: 2 touches then purchase → 1/2 each
      (1L, "view", "2024-01-01 10:00:00", 1L),
      (1L, "click", "2024-01-02 10:00:00", 2L),
      (1L, "purchase", "2024-01-03 10:00:00", 3L),
      // user 2: touch EXACTLY 7 days before, inclusive boundary → n=1
      (2L, "view", "2024-02-01 10:00:00", 4L),
      (2L, "purchase", "2024-02-08 10:00:00", 5L),
      // user 3: touch in the purchase's same second still counts; the
      // 4-touch window splits 1/4 per touch (3 views + 1 click)
      (3L, "view", "2024-03-01 10:00:00", 6L),
      (3L, "view", "2024-03-02 10:00:00", 7L),
      (3L, "view", "2024-03-03 10:00:00", 8L),
      (3L, "click", "2024-03-04 10:00:00", 9L),
      (3L, "purchase", "2024-03-04 10:00:00", 10L),
      // user 4: no touch in lookback → conversion drops entirely
      (4L, "view", "2024-04-01 10:00:00", 11L),
      (4L, "purchase", "2024-04-20 10:00:00", 12L)))
    assert(got === Map(
      ("view", 2L) -> ((1L, 0.5)), ("click", 2L) -> ((1L, 0.5)),
      ("view", 1L) -> ((1L, 1.0)),
      ("view", 4L) -> ((3L, 0.75)), ("click", 4L) -> ((1L, 0.25))))
    // denominators are powers of two, so per-channel totals are exact
    // even through float addition: view = 1/2 + 1 + 3/4, click = 1/2 + 1/4
    val byChannel = got.toSeq.groupBy(_._1._1)
      .view.mapValues(_.map(_._2._2).sum).toMap
    assert(byChannel === Map("view" -> 2.25, "click" -> 0.75))
  }

  test("linear counts other purchases as neither touch nor barrier, and " +
    "a conversion credits each lookback touch once regardless of order") {
    val got = runLinear(Seq(
      (1L, "view", "2024-01-01 10:00:00", 1L),
      (1L, "purchase", "2024-01-02 10:00:00", 2L), // n=1: the view
      (1L, "click", "2024-01-03 10:00:00", 3L),
      (1L, "purchase", "2024-01-04 10:00:00", 4L))) // n=2: view + click
    assert(got === Map(
      ("view", 1L) -> ((1L, 1.0)),
      ("view", 2L) -> ((1L, 0.5)), ("click", 2L) -> ((1L, 0.5))))
  }
}
