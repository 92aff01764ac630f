package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** [[Calibration]] — reliability bins, Brier, and ECE against
  * brute-force definitions, plus the exactness discipline (all
  * numerators bigint, partitioning-invariant). */
class CalibrationSpec extends SparkSpec {

  private val fixture: Seq[(Long, Long)] = {
    val rnd = new scala.util.Random(41)
    // a roughly-calibrated model: outcome drawn near the stated p
    Seq.fill(800) {
      val p = rnd.nextInt(1001).toLong
      val y = if (rnd.nextInt(1000) < p) 1L else 0L
      (p, y)
    }
  }

  private def df(rows: Seq[(Long, Long)], parts: Int = 4) = {
    import spark.implicits._
    rows.toDF("p", "y").repartition(parts)
  }

  test("reliability bins match a brute-force scala binning") {
    val got = Calibration
      .reliability(df(fixture), col("p"), col("y"), bins = 10)
      .collect().map(r => (r.getAs[Long]("bin"),
        (r.getAs[Long]("n"), r.getAs[Long]("pos"),
          r.getAs[Long]("score_sum"), r.getAs[Long]("gap_num"))))
      .toMap
    val want = fixture
      .groupBy { case (p, _) => math.min(p * 10 / 1000, 9L) }
      .map { case (b, rows) =>
        val n = rows.size.toLong
        val pos = rows.map(_._2).sum
        val ssum = rows.map(_._1).sum
        (b, (n, pos, ssum, math.abs(1000L * pos - ssum)))
      }
    assert(got === want)
    // quotient columns are exactly num/den of the integer columns
    Calibration.reliability(df(fixture), col("p"), col("y"), bins = 10)
      .collect().foreach { r =>
        assert(r.getAs[Double]("accuracy") ===
          r.getAs[Long]("pos").toDouble / r.getAs[Long]("n"))
        assert(r.getAs[Double]("confidence") ===
          r.getAs[Long]("score_sum").toDouble / (1000L * r.getAs[Long]("n")))
      }
  }

  test("summary Brier and ECE equal the brute-force definitions, " +
    "and a perfectly calibrated bin contributes zero ECE") {
    val r = Calibration
      .summary(df(fixture), col("p"), col("y"), bins = 10)
      .collect()(0)
    val n = fixture.size.toLong
    val brierNum = fixture.map { case (p, y) =>
      val d = p - 1000L * y; d * d }.sum
    val eceNum = fixture
      .groupBy { case (p, _) => math.min(p * 10 / 1000, 9L) }
      .map { case (_, rows) =>
        math.abs(1000L * rows.map(_._2).sum - rows.map(_._1).sum) }
      .sum
    assert(r.getAs[Long]("n") === n)
    assert(r.getAs[Long]("brier_num") === brierNum)
    assert(r.getAs[Long]("brier_den") === n * 1000000L)
    assert(r.getAs[Double]("brier") === brierNum.toDouble / (n * 1000000L))
    assert(r.getAs[Long]("ece_num") === eceNum)
    assert(r.getAs[Double]("ece") === eceNum.toDouble / (n * 1000L))

    // a bin whose confidence equals its accuracy exactly: 4 rows at
    // p=250, exactly one positive → |1000·1 − 4·250| = 0
    val exact = Seq((250L, 1L), (250L, 0L), (250L, 0L), (250L, 0L))
    val s = Calibration.summary(df(exact, 2), col("p"), col("y")).collect()(0)
    assert(s.getAs[Long]("ece_num") === 0L)
    assert(s.getAs[Double]("ece") === 0.0)
  }

  test("results are partitioning-invariant and scores clamp to [0,1000]") {
    val a = Calibration.summary(df(fixture, 1), col("p"), col("y"))
      .collect()(0).toSeq
    val b = Calibration.summary(df(fixture, 13), col("p"), col("y"))
      .collect()(0).toSeq
    assert(a === b)
    val wild = Seq((-50L, 0L), (2000L, 1L), (500L, 1L))
    val bins = Calibration
      .reliability(df(wild, 2), col("p"), col("y"), bins = 10)
      .collect().map(_.getAs[Long]("bin")).sorted
    assert(bins === Array(0L, 5L, 9L)) // clamped ends + the middle
  }
}
