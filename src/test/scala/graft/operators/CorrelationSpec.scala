package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** [[Correlation]] — brute-force differentials (Pearson direct,
  * Spearman via mid-ranks), monotone/degenerate anchors, and
  * partitioning invariance. */
class CorrelationSpec extends SparkSpec {

  private def pearsonOf(rows: Seq[(Long, Long)]) = {
    import spark.implicits._
    Correlation.pearson(rows.toDF("x", "y").repartition(4), col("x"),
      col("y")).collect()(0)
  }

  private def spearmanOf(rows: Seq[(Long, Long)]) = {
    import spark.implicits._
    Correlation.spearman(rows.toDF("x", "y").repartition(4), col("x"),
      col("y")).collect()(0)
  }

  private def brutePearson(xs: Seq[Double], ys: Seq[Double]): Double = {
    val n = xs.size.toDouble
    val mx = xs.sum / n
    val my = ys.sum / n
    val cov = xs.zip(ys).map { case (a, b) => (a - mx) * (b - my) }.sum
    val vx = xs.map(a => (a - mx) * (a - mx)).sum
    val vy = ys.map(b => (b - my) * (b - my)).sum
    cov / math.sqrt(vx * vy)
  }

  private def midRanks(vs: Seq[Long]): Map[Long, Double] =
    vs.groupBy(identity).map { case (v, g) =>
      val less = vs.count(_ < v)
      v -> (less + (g.size + 1) / 2.0)
    }

  test("pearson: exact sums and the coefficient matches brute force") {
    val rnd = new scala.util.Random(59)
    val rows = Seq.fill(400)((rnd.nextInt(1000).toLong,
      rnd.nextInt(100).toLong))
    val r = pearsonOf(rows)
    assert(r.getAs[Long]("n") === 400L)
    assert(r.getAs[Long]("sx") === rows.map(_._1).sum)
    assert(r.getAs[Double]("sxy") ===
      rows.map { case (a, b) => (a * b).toDouble }.sum)
    val expected = brutePearson(rows.map(_._1.toDouble),
      rows.map(_._2.toDouble))
    assert(math.abs(r.getAs[Double]("pearson_r") - expected) < 1e-9)
  }

  test("pearson anchors: exact linear is ±1, constant column is null") {
    val xs = (1L to 50L).toSeq
    val up = pearsonOf(xs.map(x => (x, 3L * x + 2L)))
    assert(math.abs(up.getAs[Double]("pearson_r") - 1.0) < 1e-12)
    val down = pearsonOf(xs.map(x => (x, -2L * x)))
    assert(math.abs(down.getAs[Double]("pearson_r") + 1.0) < 1e-12)
    val flat = pearsonOf(xs.map(x => (x, 7L)))
    assert(flat.isNullAt(flat.fieldIndex("pearson_r")))
  }

  test("spearman matches Pearson over brute-force mid-ranks on a tied " +
    "fixture") {
    val rnd = new scala.util.Random(61)
    val rows = Seq.fill(300)((rnd.nextInt(20).toLong,
      rnd.nextInt(15).toLong))
    val r = spearmanOf(rows)
    val rx = midRanks(rows.map(_._1))
    val ry = midRanks(rows.map(_._2))
    val expected = brutePearson(rows.map(t => rx(t._1)),
      rows.map(t => ry(t._2)))
    assert(math.abs(r.getAs[Double]("spearman_r") - expected) < 1e-9)
    // doubled mid-ranks sum to exactly n(n+1) on each axis
    assert(r.getAs[Long]("sx") === 300L * 301L)
    assert(r.getAs[Long]("sy") === 300L * 301L)
  }

  test("spearman anchors: any monotone map is exactly ±1 regardless of " +
    "nonlinearity") {
    val xs = (1L to 60L).toSeq
    val cubed = spearmanOf(xs.map(x => (x, x * x * x)))
    assert(math.abs(cubed.getAs[Double]("spearman_r") - 1.0) < 1e-12)
    val inv = spearmanOf(xs.map(x => (x, -x * x)))
    assert(math.abs(inv.getAs[Double]("spearman_r") + 1.0) < 1e-12)
  }

  test("partitioning-invariant") {
    import spark.implicits._
    val rnd = new scala.util.Random(67)
    val rows = Seq.fill(250)((rnd.nextInt(30).toLong,
      rnd.nextInt(30).toLong))
    val a = Correlation.spearman(rows.toDF("x", "y").coalesce(1),
      col("x"), col("y")).collect()(0)
    val b = Correlation.spearman(rows.toDF("x", "y").repartition(7),
      col("x"), col("y")).collect()(0)
    assert(a.toSeq === b.toSeq)
  }
}
