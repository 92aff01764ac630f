package graft.queries

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.operators.AsOfJoin

/** Hand-fixture semantics for the as-of join: latest right at-or-before,
  * equal-ts match, unmatched null, per-key isolation. */
class AsOfJoinSpec extends SparkSpec {

  test("as-of join picks the latest right row at or before each left ts") {
    import spark.implicits._
    val quotes = Seq( // (key, ts, price) — the right side
      ("A", 10L, 1.0), ("A", 20L, 2.0), ("A", 30L, 3.0),
      ("B", 15L, 9.0)).toDF("sym", "t", "price")
    val trades = Seq( // (key, ts, qty) — the left side
      ("A", 5L, 100L),   // before any quote → null
      ("A", 20L, 200L),  // equal ts → matches the 20 quote
      ("A", 25L, 300L),  // between → matches 20
      ("A", 99L, 400L),  // after all → matches 30
      ("B", 16L, 500L),  // other key isolated
      ("C", 50L, 600L))  // key with no quotes → null
      .toDF("sym", "t", "qty")

    val out = AsOfJoin.asOf(trades, quotes, Seq("sym"), "t",
        valueCols = Seq("price", "t"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        Option(r.get(3)).map(_.asInstanceOf[Double]),
        Option(r.get(4)).map(_.asInstanceOf[Long])))
      .sortBy(t => (t._1, t._2)).toSeq

    assert(out == Seq(
      ("A", 5L, 100L, None, None),
      ("A", 20L, 200L, Some(2.0), Some(20L)),
      ("A", 25L, 300L, Some(2.0), Some(20L)),
      ("A", 99L, 400L, Some(3.0), Some(30L)),
      ("B", 16L, 500L, Some(9.0), Some(15L)),
      ("C", 50L, 600L, None, None)))

    // the plan is the sort-merge shape: no cartesian, no theta join
    val plan = AsOfJoin.asOf(trades, quotes, Seq("sym"), "t", Seq("price"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("as-of join matches brute force on seeded random data") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val keys = (0 until 8).map(k => s"k$k")
    // right: distinct (key, ts) by construction
    val rights = keys.flatMap { k =>
      rnd.shuffle((0 until 60).toList).take(12).map(t => (k, t.toLong,
        rnd.nextLong(1000000)))
    }
    val lefts = (0 until 300).map { i =>
      (keys(rnd.nextInt(keys.length)), rnd.nextInt(70).toLong, i.toLong)
    }
    val out = AsOfJoin.asOf(
        lefts.toDF("k", "t", "lid"), rights.toDF("k", "t", "v"),
        Seq("k"), "t", Seq("v"))
      .collect()
      .map(r => r.getLong(2) -> Option(r.get(3)).map(_.asInstanceOf[Long]))
      .toMap
    val byKey = rights.groupBy(_._1)
    lefts.foreach { case (k, t, lid) =>
      val expect = byKey.getOrElse(k, Nil).filter(_._2 <= t)
        .sortBy(_._2).lastOption.map(_._3)
      assert(out(lid) == expect, s"left $lid (k=$k, t=$t)")
    }
  }

  test("as-of join fails fast on reserved names and prefix collisions") {
    import spark.implicits._
    val right = Seq(("A", 10L, 1.0)).toDF("k", "t", "v")

    // reserved staging name on an input
    val badLeft = Seq(("A", 20L, 1L)).toDF("k", "t", "__side")
    val e1 = intercept[IllegalArgumentException] {
      AsOfJoin.asOf(badLeft, right, Seq("k"), "t", Seq("v"))
    }
    assert(e1.getMessage.contains("__side"))

    // left already owns the carried output name prefix+valueCol
    val clashLeft = Seq(("A", 20L, 9.9)).toDF("k", "t", "asof_v")
    val e2 = intercept[IllegalArgumentException] {
      AsOfJoin.asOf(clashLeft, right, Seq("k"), "t", Seq("v"))
    }
    assert(e2.getMessage.contains("asof_v"))
  }

  test("as-of join handles a left side with no payload columns") {
    import spark.implicits._
    val left = Seq(("A", 20L), ("A", 5L)).toDF("k", "t")
    val right = Seq(("A", 10L, 7.0)).toDF("k", "t", "v")
    val out = AsOfJoin.asOf(left, right, Seq("k"), "t", Seq("v"))
      .collect().map(r => r.getLong(1) ->
        Option(r.get(2)).map(_.asInstanceOf[Double])).toMap
    assert(out == Map(20L -> Some(7.0), 5L -> None))
  }
}
