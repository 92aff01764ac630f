package graft.engine

import org.apache.spark.sql.functions._
import graft.SparkSpec

class ListeningActivitySpec extends SparkSpec {

  private val anchor = ts("2024-01-30 13:45:10") // Tuesday

  test("week range: 7 day buckets per user, silent days zero-filled") {
    val ls = listensDf(Seq(
      listen(1, "A", "2024-01-23 10:00:00"), // Tue of prev week
      listen(1, "A", "2024-01-23 11:00:00"),
      listen(1, "B", "2024-01-28 10:00:00"), // Sun of prev week
      listen(2, "C", "2024-01-25 10:00:00"),
      listen(1, "X", "2024-01-30 10:00:00"))) // outside (this week)
    val out = ListeningActivity.compute(ls, "user_id", "listened_at",
      "week", anchor)
    val rows = out.collect()
    assert(rows.length == 14, "2 users × 7 days")
    val u1 = rows.filter(_.getInt(0) == 1)
      .map(r => r.getTimestamp(1).toString -> r.getLong(2)).toMap
    assert(u1("2024-01-23 00:00:00.0") == 2)
    assert(u1("2024-01-28 00:00:00.0") == 1)
    assert(u1("2024-01-24 00:00:00.0") == 0, "silent day present as zero")
    assert(!u1.contains("2024-01-30 00:00:00.0"), "this-week listen excluded")
  }

  test("year range: 12 month buckets") {
    val ls = listensDf(Seq(
      listen(1, "A", "2023-03-15 10:00:00"),
      listen(1, "B", "2023-11-02 10:00:00")))
    val out = ListeningActivity.compute(ls, "user_id", "listened_at",
      "year", anchor)
    val rows = out.collect()
    assert(rows.length == 12, "1 user × 12 months of 2023")
    val byMonth = rows.map(r => r.getTimestamp(1).toString -> r.getLong(2)).toMap
    assert(byMonth("2023-03-01 00:00:00.0") == 1)
    assert(byMonth("2023-06-01 00:00:00.0") == 0)
  }

  test("all_time range: one bucket per year from first listen") {
    val ls = listensDf(Seq(
      listen(1, "A", "2022-06-15 10:00:00"),
      listen(1, "B", "2024-01-02 10:00:00")))
    val out = ListeningActivity.compute(ls, "user_id", "listened_at",
      "all_time", anchor)
    // grid spans epoch→anchor, but only years ≥ 1970; user has 1 row per
    // grid year — assert the two active years count correctly
    val byYear = out.collect()
      .map(r => r.getTimestamp(1).toString.take(4) -> r.getLong(2)).toMap
    assert(byYear("2022") == 1 && byYear("2024") == 1 && byYear("2023") == 0)
  }
}
