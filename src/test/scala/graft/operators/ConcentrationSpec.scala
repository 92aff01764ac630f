package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** [[Concentration.report]] — closed-form anchors (uniform → G=…,
  * single-unit → G=…), brute-force random differential, and
  * scale-invariance of the quotients. */
class ConcentrationSpec extends SparkSpec {

  private def report(ws: Seq[Long], topK: Int = 3) = {
    import spark.implicits._
    Concentration.report(
      ws.zipWithIndex.map { case (w, i) => (i.toLong, w) }
        .toDF("unit", "w").repartition(5),
      col("unit"), col("w"), topK)
      .collect()(0)
  }

  private def brute(ws: Seq[Long], topK: Int): (Double, Double, Double) = {
    val sorted = ws.sorted
    val n = ws.size.toLong
    val s = ws.sum
    val iw = sorted.zipWithIndex.map { case (w, i) => (i + 1) * w }.sum
    val gini = (2.0 * iw - (n + 1) * s) / (n * s)
    val hhi = ws.map(w => w.toDouble / s).map(x => x * x).sum
    val top = sorted.reverse.take(topK).sum.toDouble / s
    (gini, hhi, top)
  }

  test("uniform weights have Gini 0; one unit holding everything " +
    "approaches Gini 1 and has HHI 1") {
    val uni = report(Seq.fill(40)(7L))
    assert(uni.getAs[Long]("gini_num") === 0L)
    assert(uni.getAs[Double]("gini") === 0.0)
    assert(uni.getAs[Double]("hhi") === 1.0 / 40)

    val solo = report(Seq.fill(9)(0L) :+ 100L)
    // all mass at rank n: G = (2nS - (n+1)S)/(nS) = (n-1)/n
    assert(solo.getAs[Double]("gini") === 0.9)
    assert(solo.getAs[Double]("hhi") === 1.0)
    assert(solo.getAs[Double]("topk_share") === 1.0)
  }

  test("random fixture matches the brute-force definitions and the " +
    "quotients are exactly num/den") {
    val rnd = new scala.util.Random(59)
    val ws = Seq.fill(200)(rnd.nextInt(1000).toLong)
    val r = report(ws, topK = 17)
    val (g, h, t) = brute(ws, 17)
    assert(math.abs(r.getAs[Double]("gini") - g) < 1e-12)
    assert(math.abs(r.getAs[Double]("hhi") - h) < 1e-9)
    assert(r.getAs[Double]("topk_share") === t)
    assert(r.getAs[Double]("gini") ===
      r.getAs[Long]("gini_num").toDouble / r.getAs[Long]("gini_den"))
    assert(r.getAs[Double]("hhi") ===
      r.getAs[Long]("hhi_num").toDouble / r.getAs[Long]("hhi_den"))
  }

  test("Gini/HHI/top-k are scale-invariant in the weight unit") {
    val rnd = new scala.util.Random(61)
    val ws = Seq.fill(80)(1L + rnd.nextInt(50).toLong)
    val a = report(ws)
    val b = report(ws.map(_ * 1000L))
    // ranks are identical (scaling is monotone, tiebreak order shifts
    // only among equal weights, which scale together), so the
    // quotients agree exactly
    assert(a.getAs[Double]("gini") === b.getAs[Double]("gini"))
    assert(a.getAs[Double]("hhi") === b.getAs[Double]("hhi"))
    assert(a.getAs[Double]("topk_share") === b.getAs[Double]("topk_share"))
  }
}
