package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** [[ChiSquare.test2x2]] — textbook Σ(O−E)²/E differential, the
  * independence and degenerate anchors, and partitioning invariance. */
class ChiSquareSpec extends SparkSpec {

  private def run(cells: (Long, Long, Long, Long), parts: Int = 4) = {
    import spark.implicits._
    val (a, b, c, d) = cells
    val rows =
      Seq.fill(a.toInt)((true, true)) ++ Seq.fill(b.toInt)((true, false)) ++
        Seq.fill(c.toInt)((false, true)) ++ Seq.fill(d.toInt)((false, false))
    ChiSquare.test2x2(
      rows.toDF("g", "o").repartition(parts), col("g"), col("o"))
      .collect()(0)
  }

  /** Σ over cells of (O−E)²/E with E = row·col/N. */
  private def textbook(a: Long, b: Long, c: Long, d: Long): Double = {
    val n = (a + b + c + d).toDouble
    val exp = Seq(
      (a, (a + b) * (a + c) / n), (b, (a + b) * (b + d) / n),
      (c, (c + d) * (a + c) / n), (d, (c + d) * (b + d) / n))
    exp.map { case (o, e) => (o - e) * (o - e) / e }.sum
  }

  test("matches the textbook expected-counts formula") {
    val fixtures = Seq(
      (30L, 70L, 55L, 45L), (5L, 5L, 5L, 5L), (120L, 3L, 7L, 99L))
    fixtures.foreach { case f @ (a, b, c, d) =>
      val r = run(f)
      assert(r.getAs[Long]("det") === a * d - b * c)
      assert(math.abs(r.getAs[Double]("chi2") - textbook(a, b, c, d))
        < 1e-9)
    }
  }

  test("perfectly proportional cells give chi2 exactly 0; a zero " +
    "marginal gives null, not an exception") {
    val r = run((20L, 40L, 10L, 20L)) // det = 400 - 400 = 0
    assert(r.getAs[Long]("det") === 0L)
    assert(r.getAs[Double]("chi2") === 0.0)
    val degenerate = run((15L, 25L, 0L, 0L)) // empty control row
    assert(degenerate.isNullAt(degenerate.fieldIndex("chi2")))
    assert(degenerate.getAs[Long]("n") === 40L)
  }

  test("partitioning-invariant") {
    assert(run((31L, 69L, 52L, 48L), 1).toSeq ===
      run((31L, 69L, 52L, 48L), 13).toSeq)
  }
}
