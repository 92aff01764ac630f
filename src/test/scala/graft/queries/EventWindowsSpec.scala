package graft.queries

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.operators.EventWindows

/** Trailing windows: fenceposts, ordering, short histories, guards. */
class EventWindowsSpec extends SparkSpec {

  private def ev(rows: (Long, Long, String)*) = {
    import spark.implicits._
    rows.toDF("user_id", "seq_no", "etype")
  }

  test("every stride-th full window, in order, nothing ragged") {
    // 10 events for user 1: k=4, stride=3 → windows end at 4, 7, 10
    val df = ev((1L to 10L).map(i => (1L, i, s"e$i")): _*)
    val got = EventWindows.trailing(df, "user_id", "seq_no", "seq_no",
        col("etype"), k = 4, stride = 3)
      .orderBy(col("end_rank"))
      .collect().map(r => r.getInt(1).toLong ->
        r.getSeq[String](2).mkString(","))
    assert(got.toSeq == Seq(
      4L -> "e1,e2,e3,e4", 7L -> "e4,e5,e6,e7", 10L -> "e7,e8,e9,e10"))
  }

  test("keys are independent; short histories emit nothing") {
    val df = ev(
      (1L, 1L, "a"), (1L, 2L, "b"), (1L, 3L, "c"),
      (2L, 1L, "x"), (2L, 2L, "y"))
    val got = EventWindows.trailing(df, "user_id", "seq_no", "seq_no",
      col("etype"), k = 3, stride = 1)
    assert(got.count() == 1, "only user 1 reaches k=3")
    assert(got.select("user_id").collect().head.getLong(0) == 1L)
    intercept[IllegalArgumentException](EventWindows.trailing(
      df, "user_id", "seq_no", "seq_no", col("etype"), 0, 1))
    intercept[IllegalArgumentException](EventWindows.trailing(
      df.withColumn("seq", lit("x")), "user_id", "seq_no", "seq_no",
      col("etype"), 2, 1))
  }

  test("tie column makes same-timestamp order deterministic") {
    val df = ev((1L, 5L, "late1"), (1L, 5L, "late2"), (1L, 1L, "first"))
      .withColumn("tie",
        when(col("etype") === "late2", 9L).otherwise(col("seq_no")))
    val got = EventWindows.trailing(df, "user_id", "seq_no", "tie",
        col("etype"), k = 3, stride = 1)
      .collect().map(_.getSeq[String](2).mkString(","))
    assert(got.sameElements(Array("first,late1,late2")))
  }
}
