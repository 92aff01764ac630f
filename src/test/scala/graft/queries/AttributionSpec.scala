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
}
