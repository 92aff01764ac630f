package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** [[RobustMean.means]] — brute-force sorted-trim differential,
  * outlier-robustness anchor, clamp bounds, and partition
  * invariance. */
class RobustMeanSpec extends SparkSpec {

  private def run(values: Seq[Long], num: Int, den: Int) = {
    import spark.implicits._
    RobustMean.means(values.toDF("x").repartition(4), col("x"), num,
      den).collect()(0)
  }

  /** Brute force: sort, drop/clamp exactly t per tail. */
  private def brute(values: Seq[Long], num: Int, den: Int) = {
    val sorted = values.sorted
    val n = sorted.size
    val t = n * num / den
    val kept = sorted.slice(t, n - t)
    val win = Seq.fill(t)(kept.head) ++ kept ++ Seq.fill(t)(kept.last)
    (t.toLong, kept.sum, kept.size.toLong,
      kept.sum.toDouble / kept.size, win.sum.toDouble / n,
      kept.head, kept.last)
  }

  test("trimmed and winsorized means match the sorted brute force on " +
    "a random tied fixture") {
    val rnd = new scala.util.Random(83)
    val values = Seq.fill(503)(rnd.nextInt(40).toLong - 10L)
    val r = run(values, 1, 10)
    val (t, sumKept, nKept, tm, wm, lo, hi) = brute(values, 1, 10)
    assert(r.getAs[Long]("trim_n") === t)
    assert(r.getAs[Long]("sum_kept") === sumKept)
    assert(r.getAs[Long]("n_kept") === nKept)
    assert(r.getAs[Double]("trimmed_mean") === sumKept.toDouble / nKept)
    assert(math.abs(r.getAs[Double]("trimmed_mean") - tm) < 1e-12)
    assert(math.abs(r.getAs[Double]("winsorized_mean") - wm) < 1e-12)
    assert(r.getAs[Long]("lo_clamp") === lo)
    assert(r.getAs[Long]("hi_clamp") === hi)
  }

  test("a huge outlier moves the raw mean but not the trimmed mean") {
    val base = Seq.tabulate(99)(i => (i % 10).toLong + 10L)
    val withOutlier = base :+ 1000000L
    val r = run(withOutlier, 1, 20)
    val tm = r.getAs[Double]("trimmed_mean")
    assert(tm > 10.0 && tm < 20.0, s"trimmed mean $tm")
    val raw = withOutlier.sum.toDouble / withOutlier.size
    assert(raw > 10000.0)
  }

  test("zero trim degrades to the exact mean; clamps are the extremes") {
    val values = Seq(1L, 2L, 3L, 4L, 100L)
    val r = run(values, 0, 10)
    assert(r.getAs[Double]("trimmed_mean") === 22.0)
    assert(r.getAs[Double]("winsorized_mean") === 22.0)
    assert(r.getAs[Long]("lo_clamp") === 1L)
    assert(r.getAs[Long]("hi_clamp") === 100L)
  }

  test("partitioning-invariant") {
    import spark.implicits._
    val rnd = new scala.util.Random(89)
    val values = Seq.fill(301)(rnd.nextInt(25).toLong)
    val a = RobustMean.means(values.toDF("x").coalesce(1), col("x"),
      1, 8).collect()(0)
    val b = RobustMean.means(values.toDF("x").repartition(7), col("x"),
      1, 8).collect()(0)
    assert(a.toSeq === b.toSeq)
  }

  private def runMedMad(values: Seq[Long]) = {
    import spark.implicits._
    RobustMean.medianMad(values.toDF("x").repartition(4), col("x"))
      .collect()(0)
  }

  /** Brute doubled median: sum of the two middle sorted values. */
  private def bruteMed2(values: Seq[Long]): Long = {
    val s = values.sorted
    val n = s.size
    s((n + 1) / 2 - 1) + s(n / 2 + 1 - 1)
  }

  test("median and MAD match brute force on odd/even/tied fixtures") {
    val rnd = new scala.util.Random(173)
    Seq(301, 400).foreach { n =>
      val values = Seq.fill(n)(rnd.nextInt(40).toLong - 7L)
      val r = runMedMad(values)
      val med2 = bruteMed2(values)
      val mad4 = bruteMed2(values.map(v => math.abs(2L * v - med2)))
      assert(r.getAs[Long]("med2") === med2, s"n=$n")
      assert(r.getAs[Long]("mad4") === mad4, s"n=$n")
      assert(r.getAs[Double]("median") === med2 / 2.0)
      assert(r.getAs[Double]("mad") === mad4 / 4.0)
    }
  }

  test("median/MAD anchors: known small sets, outlier immunity") {
    val r = runMedMad(Seq(1L, 2L, 3L, 4L, 1000000L))
    assert(r.getAs[Double]("median") === 3.0)
    assert(r.getAs[Double]("mad") === 1.0)
    val even = runMedMad(Seq(1L, 3L, 5L, 7L))
    assert(even.getAs[Double]("median") === 4.0) // (3+5)/2
    assert(even.getAs[Double]("mad") === 2.0)
  }

  private def runOutliers(values: Seq[Long], kNum: Long, kDen: Long) = {
    import spark.implicits._
    RobustMean.outlierReport(values.toDF("x").repartition(4), col("x"),
      kNum, kDen).collect()(0)
  }

  test("outlier report matches a brute-force modified z-score gate") {
    val rnd = new scala.util.Random(197)
    val values = Seq.fill(400)(rnd.nextInt(30).toLong + 50L) ++
      Seq(5000L, -900L, 52L)
    val r = runOutliers(values, 35L, 10L)
    val med2 = bruteMed2(values)
    val mad4 = bruteMed2(values.map(v => math.abs(2L * v - med2)))
    val out = values.filter(v =>
      2L * 10L * 10000L * math.abs(2L * v - med2) > 35L * 14826L * mad4)
    assert(r.getAs[Long]("n_outliers") === out.size.toLong)
    assert(r.getAs[Long]("out_min") === out.min)
    assert(r.getAs[Long]("out_max") === out.max)
    assert(r.getAs[Long]("sum_outliers") === out.sum)
    assert(out.contains(5000L) && out.contains(-900L) &&
      !out.contains(52L))
  }

  test("no outliers on a tight distribution: count 0, null bounds") {
    val r = runOutliers((1L to 100L).map(_ % 5L + 10L), 35L, 10L)
    assert(r.getAs[Long]("n_outliers") === 0L)
    assert(r.isNullAt(r.fieldIndex("out_min")))
    assert(r.getAs[Long]("sum_outliers") === 0L)
  }

  test("zero-MAD convention: when the majority shares one value, " +
    "every differing value is an outlier") {
    val r = runOutliers(Seq.fill(60)(7L) ++ Seq(8L, 6L, 7L), 35L, 10L)
    assert(r.getAs[Long]("mad4") === 0L)
    assert(r.getAs[Long]("n_outliers") === 2L)
  }
}
