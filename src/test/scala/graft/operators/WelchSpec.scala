package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** [[Welch.tTest]] — textbook differential, degenerate anchors, and
  * partitioning invariance. */
class WelchSpec extends SparkSpec {

  private def run(rows: Seq[(Boolean, Long)]) = {
    import spark.implicits._
    Welch.tTest(rows.toDF("g", "x").repartition(4), col("g"), col("x"))
      .collect()(0)
  }

  test("sufficient statistics are exact and t/df match the textbook " +
    "formulas computed independently") {
    val rnd = new scala.util.Random(41)
    val rows = Seq.fill(800)(
      (rnd.nextBoolean(), (rnd.nextInt(90) + 10).toLong))
    val r = run(rows)
    val g1 = rows.filter(_._1).map(_._2)
    val g0 = rows.filterNot(_._1).map(_._2)
    assert(r.getAs[Long]("n1") === g1.size.toLong)
    assert(r.getAs[Long]("n0") === g0.size.toLong)
    assert(r.getAs[Long]("sum1") === g1.sum)
    assert(r.getAs[Long]("ss1") === g1.map(x => x * x).sum)
    // independent double-precision reimplementation (same order)
    def stats(xs: Seq[Long]): (Double, Double) = {
      val n = xs.size.toDouble
      val m = xs.sum.toDouble / n
      val v = (xs.map(x => x * x).sum.toDouble -
        xs.sum.toDouble * xs.sum / n) / (n - 1.0)
      (m, v)
    }
    val (m1, v1) = stats(g1)
    val (m0, v0) = stats(g0)
    assert(math.abs(r.getAs[Double]("mean1") - m1) < 1e-12)
    assert(math.abs(r.getAs[Double]("var1") - v1) < 1e-9)
    val se2 = v1 / g1.size + v0 / g0.size
    val t = (m1 - m0) / math.sqrt(se2)
    val dfW = se2 * se2 / (
      v1 / g1.size * (v1 / g1.size) / (g1.size - 1.0) +
        v0 / g0.size * (v0 / g0.size) / (g0.size - 1.0))
    assert(math.abs(r.getAs[Double]("t") - t) < 1e-9)
    assert(math.abs(r.getAs[Double]("df_welch") - dfW) < 1e-6)
    // Welch df is bounded by min(n-1) below and n1+n0-2 above
    assert(dfW >= math.min(g1.size, g0.size) - 1.0 &&
      dfW <= g1.size + g0.size - 2.0)
  }

  test("a clear mean shift yields a large |t|; identical groups yield " +
    "t near 0") {
    val rnd = new scala.util.Random(7)
    val shifted = Seq.fill(400)((true, (rnd.nextInt(10) + 40).toLong)) ++
      Seq.fill(400)((false, (rnd.nextInt(10) + 10).toLong))
    assert(run(shifted).getAs[Double]("t") > 10.0)
    val same = Seq.tabulate(400)(i => (i % 2 == 0, (i % 17).toLong))
    assert(math.abs(run(same).getAs[Double]("t")) < 1.0)
  }

  test("degenerate inputs are data, not exceptions: tiny groups and " +
    "zero variance go null") {
    val oneRow = run(Seq((true, 5L), (false, 3L), (false, 4L)))
    assert(oneRow.isNullAt(oneRow.fieldIndex("var1")))
    assert(oneRow.isNullAt(oneRow.fieldIndex("t")))
    val constant = run(Seq((true, 5L), (true, 5L), (false, 5L),
      (false, 5L)))
    assert(constant.getAs[Double]("var1") === 0.0)
    assert(constant.isNullAt(constant.fieldIndex("t")))
  }

  test("grouped sweep: every segment's row equals the scalar test on " +
    "that segment's rows alone") {
    import spark.implicits._
    val rnd = new scala.util.Random(47)
    val rows = Seq.fill(900)((rnd.nextInt(5).toLong, rnd.nextBoolean(),
      (rnd.nextInt(80) + 5).toLong))
    val swept = Welch.tTestBy(rows.toDF("seg", "g", "x").repartition(4),
      col("seg"), col("g"), col("x"))
      .collect().map(r => r.getAs[Long]("segment") -> r).toMap
    (0L until 5L).foreach { s =>
      val scalar = Welch.tTest(
        rows.filter(_._1 == s).map(t => (t._2, t._3)).toDF("g", "x"),
        col("g"), col("x")).collect()(0)
      val sweptRow = swept(s)
      scalar.schema.fieldNames.foreach { f =>
        assert(sweptRow.getAs[Any](f) === scalar.getAs[Any](f),
          s"segment $s field $f")
      }
    }
  }

  test("partitioning-invariant: identical bigints and IEEE steps at " +
    "any layout") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    val rows = Seq.fill(300)((rnd.nextBoolean(), rnd.nextInt(50).toLong))
    val a = Welch.tTest(rows.toDF("g", "x").coalesce(1), col("g"),
      col("x")).collect()(0)
    val b = Welch.tTest(rows.toDF("g", "x").repartition(7), col("g"),
      col("x")).collect()(0)
    assert(a.toSeq === b.toSeq)
  }
}
