package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** [[TrendOls.dailyTrend]] — brute-force OLS differential with
  * zero-filled days, linear/constant anchors, and partition
  * invariance. */
class TrendOlsSpec extends SparkSpec {

  private val days = 12

  private def toTs(day: Int): java.sql.Timestamp =
    java.sql.Timestamp.valueOf(
      java.time.LocalDate.of(2024, 5, 1).plusDays(day.toLong)
        .atTime(9, 30))

  private def run(rows: Seq[(Long, Int)]) = {
    import spark.implicits._
    TrendOls.dailyTrend(
      rows.map { case (k, d) => (k, toTs(d)) }.toDF("k", "ts")
        .repartition(5),
      col("k"), col("ts"), "2024-05-01", days)
      .collect().map(r => r.getAs[Long]("key") -> r).toMap
  }

  /** Brute OLS of the zero-filled daily count series. */
  private def brute(daysOfKey: Seq[Int]): (Double, Double, Double) = {
    val y = (0 until days).map(d => daysOfKey.count(_ == d).toDouble)
    val t = (0 until days).map(_.toDouble)
    val n = days.toDouble
    val (st, sy) = (t.sum, y.sum)
    val sty = t.zip(y).map { case (a, b) => a * b }.sum
    val (stt, syy) = (t.map(a => a * a).sum, y.map(b => b * b).sum)
    val slope = (n * sty - st * sy) / (n * stt - st * st)
    val intercept = (sy - slope * st) / n
    val r2 = math.pow(n * sty - st * sy, 2) /
      ((n * stt - st * st) * (n * syy - sy * sy))
    (slope, intercept, r2)
  }

  test("slope/intercept/r2 match a brute-force OLS over the " +
    "zero-filled series, out-of-window rows excluded") {
    val rnd = new scala.util.Random(137)
    val rows = Seq.fill(300)(
      (rnd.nextInt(4).toLong, rnd.nextInt(days + 6) - 3))
    val got = run(rows)
    rows.groupBy(_._1).foreach { case (k, g) =>
      val inWin = g.map(_._2).filter(d => d >= 0 && d < days)
      val (slope, intercept, r2) = brute(inWin)
      val r = got(k)
      assert(r.getAs[Long]("sy") === inWin.size.toLong, s"key $k")
      assert(math.abs(r.getAs[Double]("slope") - slope) < 1e-12, s"key $k")
      assert(math.abs(r.getAs[Double]("intercept") - intercept) < 1e-12)
      assert(math.abs(r.getAs[Double]("r2") - r2) < 1e-9, s"key $k")
    }
  }

  test("a perfectly linear ramp has r2 = 1 and the exact slope; a " +
    "constant series has slope 0 and null r2") {
    // key 1: day d gets d+1 events → counts 1,2,..,12: slope 1, r2 1
    val ramp = (0 until days).flatMap(d => Seq.fill(d + 1)((1L, d)))
    // key 2: every day exactly 3 events → slope 0, zero variance
    val flat = (0 until days).flatMap(d => Seq.fill(3)((2L, d)))
    val got = run(ramp ++ flat)
    assert(got(1L).getAs[Double]("slope") === 1.0)
    assert(math.abs(got(1L).getAs[Double]("r2") - 1.0) < 1e-12)
    assert(got(2L).getAs[Double]("slope") === 0.0)
    assert(got(2L).isNullAt(got(2L).fieldIndex("r2")))
  }

  test("missing days count as zero design points: a key seen only on " +
    "day 0 trends DOWN") {
    val got = run(Seq.fill(10)((7L, 0)))
    assert(got(7L).getAs[Double]("slope") < 0.0)
  }

  test("partitioning-invariant") {
    import spark.implicits._
    val rnd = new scala.util.Random(139)
    val rows = Seq.fill(200)((rnd.nextInt(3).toLong, rnd.nextInt(days)))
    def at(parts: Int) = TrendOls.dailyTrend(
      rows.map { case (k, d) => (k, toTs(d)) }.toDF("k", "ts")
        .repartition(parts),
      col("k"), col("ts"), "2024-05-01", days)
      .orderBy(col("key")).collect().toSeq
    assert(at(1) === at(7))
  }
}
