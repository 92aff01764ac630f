package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** [[Bootstrap.poissonMeans]] — independent MessageDigest replay of
  * the weights, replica-mean statistics, CI behavior, partitioning
  * invariance. */
class BootstrapSpec extends SparkSpec {

  private val rows: Seq[(Long, Long)] = {
    val rnd = new scala.util.Random(83)
    (1L to 2000L).map(i => (i, 100L + rnd.nextInt(900)))
  }

  private def run(b: Int, parts: Int = 4) = {
    import spark.implicits._
    Bootstrap.poissonMeans(
      rows.toDF("k", "x").repartition(parts),
      col("k"), col("x"), replicas = b, salt = "t")
      .collect()
      .map(r => (r.getAs[Long]("replica"),
        (r.getAs[Long]("n_eff"), r.getAs[Long]("sum_cents"))))
      .toMap
  }

  /** Same draw via java MessageDigest + the embedded CDF constants. */
  private def bruteReplica(b: Int): (Long, Long) = {
    val mdi = java.security.MessageDigest.getInstance("MD5")
    var (n, s) = (0L, 0L)
    rows.foreach { case (k, x) =>
      val hex = mdi.digest(s"$k:bs${b / 4}:t".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
        .substring(8 * (b % 4), 8 * (b % 4) + 8)
      val w = Bootstrap.CdfHex.indexWhere(hex < _) match {
        case -1 => 7L
        case i  => i.toLong
      }
      n += w; s += w * x
    }
    (n, s)
  }

  test("every replica's weighted sums replay in an independent impl") {
    val got = run(8)
    (0 until 8).foreach { b =>
      assert(got(b.toLong) === bruteReplica(b), s"replica $b")
    }
  }

  test("replica effective sizes concentrate around n and replica " +
    "means bracket the true mean") {
    val got = run(32)
    val trueMean = rows.map(_._2).sum.toDouble / rows.size
    val means = got.values.toSeq.map { case (n, s) => s.toDouble / n }
    // Poisson(1) total: mean n, sd sqrt(n) ~ 45 for n=2000
    got.values.foreach { case (n, _) =>
      assert(math.abs(n - 2000L) < 6 * math.sqrt(2000.0))
    }
    // the bootstrap distribution must straddle the point estimate
    assert(means.min < trueMean && trueMean < means.max)
    // and its spread must be near sd/sqrt(n) (within a loose 3x band)
    val sd = math.sqrt(rows.map(x =>
      math.pow(x._2 - trueMean, 2)).sum / rows.size)
    val se = sd / math.sqrt(rows.size.toDouble)
    val bootSd = math.sqrt(
      means.map(m => math.pow(m - means.sum / means.size, 2)).sum
        / means.size)
    assert(bootSd > se / 3 && bootSd < se * 3)
  }

  test("partitioning-invariant and replica-independent: prefixes of " +
    "the replica set agree") {
    assert(run(8, 1).toSeq.sortBy(_._1) === run(8, 13).toSeq.sortBy(_._1))
    val r16 = run(16)
    val r8 = run(8)
    (0 until 8).foreach(b => assert(r16(b.toLong) === r8(b.toLong)))
  }

  private def runFast(b: Int, parts: Int = 4) = {
    import spark.implicits._
    Bootstrap.poissonMeansFast(
      rows.toDF("k", "x").repartition(parts),
      col("k"), col("x"), replicas = b, salt = "t")
      .collect()
      .map(r => (r.getAs[Long]("replica"),
        (r.getAs[Long]("n_eff"), r.getAs[Long]("sum_cents"))))
      .toMap
  }

  test("fast family: same statistical envelope as the md5 family — " +
    "n_eff concentration, straddling means, SE-scaled spread") {
    val got = runFast(24)
    val trueMean = rows.map(_._2).sum.toDouble / rows.size
    got.values.foreach { case (n, _) =>
      assert(math.abs(n - 2000L) < 6 * math.sqrt(2000.0))
    }
    val means = got.values.toSeq.map { case (n, s) => s.toDouble / n }
    assert(means.min < trueMean && trueMean < means.max)
    val sd = math.sqrt(rows.map(x =>
      math.pow(x._2 - trueMean, 2)).sum / rows.size)
    val se = sd / math.sqrt(rows.size.toDouble)
    val bootSd = math.sqrt(
      means.map(m => math.pow(m - means.sum / means.size, 2)).sum
        / means.size)
    assert(bootSd > se / 3 && bootSd < se * 3)
  }

  test("fast family: deterministic, partitioning-invariant, prefix-" +
    "independent, and the two word-halves of one hash draw " +
    "independently") {
    assert(runFast(8, 1).toSeq.sortBy(_._1) ===
      runFast(8, 13).toSeq.sortBy(_._1))
    val r16 = runFast(16)
    (0 until 8).foreach(b => assert(r16(b.toLong) === runFast(8)(b.toLong)))
    // replicas 2g and 2g+1 share a hash but not a draw
    (0 until 8 by 2).foreach(b =>
      assert(r16(b.toLong) !== r16(b.toLong + 1)))
    // and the fast family is a DIFFERENT draw than the md5 family
    val md5r = run(8)
    assert((0 until 8).exists(b => md5r(b.toLong) !== runFast(8)(b.toLong)))
  }

  test("fast family draws replay EXACTLY against the clean-room " +
    "xxhash64 reference — every key, every replica") {
    // independent reimplementation of weightFast: clean-room XXH64
    // (TestXxHash64, written from the public spec, not Spark source),
    // high/low word split, integer CDF thresholds
    def expectedW(k: Long, b: Int): Long = {
      val h = graft.TestXxHash64.hashString(s"$k:bs${b / 2}:t")
      val u = if (b % 2 == 0) h >>> 32 else h & 0xFFFFFFFFL
      Bootstrap.CdfLong.indexWhere(u < _) match {
        case -1 => 7L
        case i  => i.toLong
      }
    }
    def bruteFastReplica(b: Int): (Long, Long) = {
      var (n, s) = (0L, 0L)
      rows.foreach { case (k, x) =>
        val w = expectedW(k, b); n += w; s += w * x
      }
      (n, s)
    }
    val got = runFast(8)
    (0 until 8).foreach { b =>
      assert(got(b.toLong) === bruteFastReplica(b), s"replica $b")
    }
  }
}
