package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** [[PpsSample.sample]] — independent-md5 brute replay, the exact-m
  * invariant, proportionality bounds, and partition invariance. */
class PpsSampleSpec extends SparkSpec {

  private def run(rows: Seq[(Long, Long)], m: Long) = {
    import spark.implicits._
    PpsSample.sample(rows.toDF("id", "w").repartition(4), col("id"),
      col("w"), m)
      .collect()
      .map(r => r.getAs[Long]("id") -> r.getAs[Long]("multiplicity"))
      .toMap
  }

  private def md5hex(s: String): String = {
    val mdi = java.security.MessageDigest.getInstance("MD5")
    mdi.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
  }

  /** Driver replay: same order, midpoints, interval containment. */
  private def brute(rows: Seq[(Long, Long)], m: Long): Map[Long, Long] = {
    val ordered = rows.filter(_._2 > 0L)
      .sortBy { case (id, _) => (md5hex(s"$id:pps"), id) }
    val bigW = ordered.map(_._2).sum
    val points = (0L until m).map(k => bigW * (2 * k + 1) / (2 * m))
    var cum = 0L
    ordered.flatMap { case (id, w) =>
      val lo = cum
      cum += w
      val hits = points.count(p => p >= lo && p < cum).toLong
      if (hits > 0) Some(id -> hits) else None
    }.toMap
  }

  test("the sample replays an independent driver-side systematic " +
    "PPS pass exactly") {
    val rnd = new scala.util.Random(179)
    val rows = (0L until 200L).map(i => (i, rnd.nextInt(50).toLong))
    Seq(1L, 7L, 40L, 163L).foreach { m =>
      assert(run(rows, m) === brute(rows, m), s"m=$m")
    }
  }

  test("multiplicities sum to exactly m, and an item holding more " +
    "than a 1/m weight share is guaranteed in") {
    val rnd = new scala.util.Random(181)
    val rows = (0L until 150L).map(i =>
      (i, rnd.nextInt(20).toLong + 1L)) :+ (999L, 2000L)
    val m = 25L
    val got = run(rows, m)
    assert(got.values.sum === m)
    // item 999 holds ~43% of the weight → expect ≥ floor(0.43·25) hits
    val bigW = rows.map(_._2).sum
    val share = 2000.0 * m / bigW
    assert(got(999L) >= share.floor.toLong)
    assert(got(999L) <= share.ceil.toLong)
  }

  test("zero weights never sample; m larger than the item count " +
    "multiplies items rather than failing") {
    val got = run(Seq((1L, 0L), (2L, 3L), (3L, 3L)), 10L)
    assert(!got.contains(1L))
    assert(got.values.sum === 10L)
    assert(got.keySet === Set(2L, 3L))
  }

  test("partitioning-invariant") {
    import spark.implicits._
    val rnd = new scala.util.Random(191)
    val rows = (0L until 120L).map(i => (i, rnd.nextInt(30).toLong))
    def at(parts: Int) = PpsSample.sample(
      rows.toDF("id", "w").repartition(parts), col("id"), col("w"), 17L)
      .orderBy(col("id")).collect().toSeq
    assert(at(1) === at(6))
  }

  // ---- production xxhash64 ordering family ------------------------------

  private def runFast(rows: Seq[(Long, Long)], m: Long, parts: Int = 4) = {
    import spark.implicits._
    PpsSample.sampleFast(rows.toDF("id", "w").repartition(parts),
      col("id"), col("w"), m)
      .collect()
      .map(r => r.getAs[Long]("id") -> r.getAs[Long]("multiplicity"))
      .toMap
  }

  /** Driver replay of the FAST draw with the clean-room XXH64 reference
    * (TestXxHash64): same weight line, ordered by the signed 64-bit hash
    * the way Spark sorts LongType. */
  private def bruteFast(rows: Seq[(Long, Long)], m: Long): Map[Long, Long] = {
    val ordered = rows.filter(_._2 > 0L)
      .sortBy { case (id, _) =>
        (graft.TestXxHash64.hashString(s"$id:pps"), id) }
    val bigW = ordered.map(_._2).sum
    val points = (0L until m).map(k => bigW * (2 * k + 1) / (2 * m))
    var cum = 0L
    ordered.flatMap { case (id, w) =>
      val lo = cum
      cum += w
      val hits = points.count(p => p >= lo && p < cum).toLong
      if (hits > 0) Some(id -> hits) else None
    }.toMap
  }

  test("fast family replays an independent clean-room-xxhash64 driver " +
    "pass exactly, sums to m, and is partitioning-invariant") {
    val rnd = new scala.util.Random(307)
    val rows = (0L until 200L).map(i => (i, rnd.nextInt(50).toLong))
    Seq(1L, 7L, 40L, 163L).foreach { m =>
      val got = runFast(rows, m)
      assert(got === bruteFast(rows, m), s"m=$m")
      assert(got.values.sum === m, s"m=$m")
    }
    assert(runFast(rows, 17L, parts = 1) === runFast(rows, 17L, parts = 6))
    // and it is a DIFFERENT draw order than the md5 family
    assert(runFast(rows, 17L) !== run(rows, 17L))
  }
}
