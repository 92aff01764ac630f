package graft.queries

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.operators.RangeJoin

/** Hand-fixture semantics for the bin-bucketed range join: containment
  * inclusive on both ends, exactly-once pair emission across bin
  * boundaries, per-key isolation, no theta-join plan. */
class RangeJoinSpec extends SparkSpec {

  test("range join emits each qualifying pair exactly once") {
    import spark.implicits._
    val intervals = Seq(
      ("A", 10L, 20L, "w1"),   // within one bin (width 100)
      ("A", 90L, 210L, "w2"),  // spans three bins
      ("B", 10L, 20L, "w3"))
      .toDF("k", "s", "e", "wid")
    val points = Seq(
      ("A", 10L, "p-start"),   // on start boundary of w1
      ("A", 20L, "p-end"),     // on end boundary of w1
      ("A", 150L, "p-mid"),    // mid-bin inside w2 only
      ("A", 25L, "p-out"),     // inside no interval
      ("B", 15L, "p-bkey"))    // key isolation
      .toDF("k", "t", "pid")

    val out = RangeJoin.byBins(points, intervals, Seq("k"),
        "t", "s", "e", binWidth = 100L)
      .select(col("pid"), col("wid")).collect()
      .map(r => r.getString(0) -> r.getString(1)).sorted.toSeq
    assert(out == Seq(
      "p-bkey" -> "w3", "p-end" -> "w1", "p-mid" -> "w2",
      "p-start" -> "w1"))

    // exactly-once across bins: a point inside a multi-bin interval must
    // appear once even though the interval exploded into 3 bins
    assert(out.count(_ == ("p-mid" -> "w2")) == 1)

    val plan = RangeJoin.byBins(points, intervals, Seq("k"),
        "t", "s", "e", 100L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("range join matches brute force on seeded random data") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    val keys = (0 until 6).map(k => s"k$k")
    val intervals = (0 until 60).map { i =>
      val s = rnd.nextInt(500).toLong
      (keys(rnd.nextInt(keys.length)), s, s + rnd.nextInt(120).toLong,
        i.toLong)
    }
    val points = (0 until 250).map { i =>
      (keys(rnd.nextInt(keys.length)), rnd.nextInt(650).toLong, i.toLong)
    }
    // binWidth deliberately NOT dividing the ranges evenly
    val got = RangeJoin.byBins(
        points.toDF("k", "t", "pid"), intervals.toDF("k", "s", "e", "wid"),
        Seq("k"), "t", "s", "e", binWidth = 37L)
      .select("pid", "wid").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).sorted.toSeq
    val want = (for {
      (pk, pt, pid) <- points
      (ik, is, ie, wid) <- intervals
      if pk == ik && pt >= is && pt <= ie
    } yield pid -> wid).sorted
    assert(got == want)
  }

  test("inverted intervals are empty, not descending bin explosions") {
    import spark.implicits._
    val intervals = Seq(("A", 200L, 100L, "inv"), ("A", 10L, 20L, "ok"))
      .toDF("k", "s", "e", "wid")
    val points = Seq(("A", 15L, "p1"), ("A", 150L, "p2"))
      .toDF("k", "t", "pid")
    val out = RangeJoin.byBins(points, intervals, Seq("k"),
        "t", "s", "e", binWidth = 50L)
      .select("pid", "wid").collect()
      .map(r => r.getString(0) -> r.getString(1)).toSeq
    assert(out == Seq("p1" -> "ok"),
      "end < start matches no point (empty interval), emits nothing")
  }

  test("an interval spanning more than maxBinsPerInterval fails fast") {
    import spark.implicits._
    val intervals = Seq(("A", 0L, 10000L, "huge")).toDF("k", "s", "e", "wid")
    val points = Seq(("A", 5L, "p1")).toDF("k", "t", "pid")
    val e = intercept[Exception] {
      RangeJoin.byBins(points, intervals, Seq("k"), "t", "s", "e",
        binWidth = 1L, maxBinsPerInterval = 100).collect()
    }
    assert(e.getMessage.contains("widen binWidth") ||
      Option(e.getCause).exists(_.getMessage.contains("widen binWidth")),
      s"unexpected: $e")
  }
}
