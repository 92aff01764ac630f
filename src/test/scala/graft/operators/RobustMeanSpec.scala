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
}
