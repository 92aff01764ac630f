package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** [[ShardPlan.assign]] — independent rank/snake replay, the balance
  * property, and partition invariance. */
class ShardPlanSpec extends SparkSpec {

  private def run(rows: Seq[(Long, Long)], bins: Int) = {
    import spark.implicits._
    ShardPlan.assign(rows.toDF("id", "n").repartition(5), col("id"),
      col("n"), bins)
      .collect()
      .map(r => r.getAs[Long]("id") ->
        (r.getAs[Long]("rank"), r.getAs[Long]("bin")))
      .toMap
  }

  private def md5hex(s: String): String = {
    val mdi = java.security.MessageDigest.getInstance("MD5")
    mdi.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
  }

  private def brute(rows: Seq[(Long, Long)],
      bins: Int): Map[Long, (Long, Long)] =
    rows.sortBy { case (id, n) => (-n, md5hex(s"$id:shard"), id) }
      .zipWithIndex.map { case ((id, _), i) =>
        val r0 = i.toLong % (2L * bins)
        val bin = if (r0 < bins) r0 else 2L * bins - 1L - r0
        id -> (i + 1L, bin)
      }.toMap

  test("ranks and snake bins replay an independent driver-side " +
    "implementation, size ties included") {
    val rnd = new scala.util.Random(233)
    val rows = (0L until 300L).map(i => (i, rnd.nextInt(40).toLong + 1L))
    Seq(1, 4, 7).foreach { b =>
      assert(run(rows, b) === brute(rows, b), s"bins=$b")
    }
  }

  test("balance: on skewed sizes every bin's load is within one max " +
    "item of every other") {
    val rnd = new scala.util.Random(239)
    val rows = (0L until 400L).map(i =>
      (i, math.pow(10, rnd.nextDouble() * 3).toLong + 1L))
    val bins = 8
    val got = run(rows, bins)
    val sizes = rows.toMap
    val loads = got.toSeq.groupBy(_._2._2)
      .map { case (_, g) => g.map(t => sizes(t._1)).sum }
    assert(loads.size === bins)
    val maxItem = sizes.values.max
    assert(loads.max - loads.min <= maxItem,
      s"spread ${loads.max - loads.min} vs max item $maxItem")
  }

  test("partitioning-invariant") {
    import spark.implicits._
    val rnd = new scala.util.Random(241)
    val rows = (0L until 150L).map(i => (i, rnd.nextInt(30).toLong + 1L))
    def at(parts: Int) = ShardPlan.assign(
      rows.toDF("id", "n").repartition(parts), col("id"), col("n"), 5)
      .orderBy(col("rank")).collect().toSeq
    assert(at(1) === at(9))
  }
}
