package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** [[FrequencySubsample.subsample]] — keep-rule replay against an
  * independent Scala implementation, the always-keep floor, rate
  * envelope, and partitioning determinism. */
class FrequencySubsampleSpec extends SparkSpec {

  // 3 items with very different shares: 'hot' 80%, 'warm' 18%, 'rare' 2%
  private val occ: Seq[(Long, String)] = (1L to 5000L).map { i =>
    val item = if (i % 100 < 80) "hot" else if (i % 100 < 98) "warm"
    else "rare"
    (i, item)
  }

  private def run(t: Double, parts: Int = 5) = {
    import spark.implicits._
    FrequencySubsample.subsample(
      occ.toDF("id", "item").repartition(parts),
      col("item"), col("id"), t = t)
      .select("id", "item", "item_count", "keep_thr")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3)))
  }

  /** Independent replay: same formula, same md5-hex-string compare,
    * via java.security.MessageDigest. */
  private def bruteKeep(t: Double): Set[Long] = {
    val counts = occ.groupBy(_._2).map { case (k, v) => k -> v.size }
    val n = occ.size.toDouble
    val thr = counts.map { case (k, c) =>
      val p = math.sqrt(t * n / c) + t * n / c
      k -> math.min(math.floor(p * 4294967296.0).toLong, 4294967296L)
    }
    val mdi = java.security.MessageDigest.getInstance("MD5")
    occ.filter { case (id, item) =>
      val hex = mdi.digest(s"$id:ss".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 8)
      thr(item) == 4294967296L ||
        hex < f"${thr(item)}%08x"
    }.map(_._1).toSet
  }

  test("per-row keep decisions replay exactly in an independent impl") {
    val t = 0.01
    assert(run(t).map(_._1).toSet === bruteKeep(t))
  }

  test("items at or below the frequency floor are always kept; hot " +
    "items are thinned toward sqrt(t/f)") {
    val t = 0.01
    val kept = run(t)
    // rare = 2% <= ... its P_keep: sqrt(.01/.02)+.5 > 1 -> all 100 kept
    assert(kept.count(_._2 == "rare") === occ.count(_._2 == "rare"))
    // hot = 80%: P = sqrt(1/80)+1/80 ~ 0.1243; binomial(4000, .1243)
    val hotKept = kept.count(_._2 == "hot")
    val expected = 4000 * (math.sqrt(t / 0.8) + t / 0.8)
    assert(math.abs(hotKept - expected) < 5 * math.sqrt(expected))
    // audit columns carry the corpus count
    assert(kept.filter(_._2 == "hot").forall(_._3 === 4000L))
  }

  test("result is partitioning-invariant") {
    assert(run(0.02, 1).sortBy(_._1).toSeq ===
      run(0.02, 17).sortBy(_._1).toSeq)
  }

  // ----------------------------------------------------- fast family

  private def runFast(t: Double, parts: Int = 5) = {
    import spark.implicits._
    FrequencySubsample.subsampleFast(
      occ.toDF("id", "item").repartition(parts),
      col("item"), col("id"), t = t)
      .select("id", "item", "item_count", "keep_thr")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3)))
  }

  /** Independent replay of the fast draw: clean-room XXH64 of the same
    * salted key, unsigned top 32 bits compared as a long. */
  private def bruteKeepFast(t: Double): Set[Long] = {
    val counts = occ.groupBy(_._2).map { case (k, v) => k -> v.size }
    val n = occ.size.toDouble
    val thr = counts.map { case (k, c) =>
      val p = math.sqrt(t * n / c) + t * n / c
      k -> math.min(math.floor(p * 4294967296.0).toLong, 4294967296L)
    }
    occ.filter { case (id, item) =>
      thr(item) == 4294967296L ||
        (graft.TestXxHash64.hashString(s"$id:ss") >>> 32) < thr(item)
    }.map(_._1).toSet
  }

  test("fast-family keep decisions replay exactly against the " +
    "clean-room TestXxHash64") {
    val t = 0.01
    assert(runFast(t).map(_._1).toSet === bruteKeepFast(t))
  }

  test("fast family shares the exact keep_thr dimension with the md5 " +
    "family and keeps floor items unconditionally") {
    val t = 0.01
    val md5Thr = run(t).map(r => r._2 -> r._4).toMap
    val fast = runFast(t)
    assert(fast.map(r => r._2 -> r._4).toMap === md5Thr)
    assert(fast.count(_._2 == "rare") === occ.count(_._2 == "rare"))
  }

  test("fast-family result is partitioning-invariant") {
    assert(runFast(0.02, 1).sortBy(_._1).toSeq ===
      runFast(0.02, 17).sortBy(_._1).toSeq)
  }
}
