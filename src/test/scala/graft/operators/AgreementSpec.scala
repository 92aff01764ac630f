package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** [[Agreement.cohensKappa]] — textbook differential and the
  * perfect/chance/degenerate anchors. */
class AgreementSpec extends SparkSpec {

  private def run(rows: Seq[(Long, Long)]) = {
    import spark.implicits._
    Agreement.cohensKappa(rows.toDF("a", "b").repartition(4),
      col("a"), col("b")).collect()(0)
  }

  test("kappa matches the textbook po/pe computation on a random " +
    "3-label fixture, numerators exact") {
    val rnd = new scala.util.Random(163)
    val rows = Seq.fill(600)(
      (rnd.nextInt(3).toLong,
        if (rnd.nextBoolean()) rnd.nextInt(3).toLong else 0L))
    val r = run(rows)
    val n = rows.size.toDouble
    val po = rows.count(t => t._1 == t._2) / n
    val pe = (0L to 2L).map(k =>
      rows.count(_._1 == k) * rows.count(_._2 == k) / (n * n)).sum
    val kappa = (po - pe) / (1 - pe)
    assert(r.getAs[Long]("n") === 600L)
    assert(r.getAs[Long]("agree") === rows.count(t => t._1 == t._2))
    assert(r.getAs[Long]("chance_num") === (0L to 2L).map(k =>
      rows.count(_._1 == k).toLong * rows.count(_._2 == k)).sum)
    assert(math.abs(r.getAs[Double]("kappa") - kappa) < 1e-12)
  }

  test("perfect agreement is exactly 1; independent-looking swaps go " +
    "negative; both-raters-constant is null") {
    val perfect = run((0 until 90).map(i => ((i % 3).toLong, (i % 3).toLong)))
    assert(perfect.getAs[Double]("kappa") === 1.0)
    val opposed = run((0 until 90).map(i =>
      ((i % 2).toLong, (1 - i % 2).toLong)))
    assert(opposed.getAs[Double]("kappa") < 0.0)
    val constant = run(Seq.fill(40)((1L, 1L)))
    assert(constant.isNullAt(constant.fieldIndex("kappa")))
  }

  test("labels present for only one rater still enter that rater's " +
    "marginal but add no chance mass") {
    // rater A uses {0,1}, rater B uses {1,2}: only label 1 overlaps
    val rows = Seq((0L, 1L), (0L, 2L), (1L, 1L), (1L, 1L))
    val r = run(rows)
    // chance_num = row_1 * col_1 = 2 * 3
    assert(r.getAs[Long]("chance_num") === 6L)
    assert(r.getAs[Long]("agree") === 2L)
  }

  test("partitioning-invariant") {
    import spark.implicits._
    val rnd = new scala.util.Random(167)
    val rows = Seq.fill(300)(
      (rnd.nextInt(4).toLong, rnd.nextInt(4).toLong))
    val a = Agreement.cohensKappa(rows.toDF("a", "b").coalesce(1),
      col("a"), col("b")).collect()(0)
    val b = Agreement.cohensKappa(rows.toDF("a", "b").repartition(7),
      col("a"), col("b")).collect()(0)
    assert(a.toSeq === b.toSeq)
  }
}
