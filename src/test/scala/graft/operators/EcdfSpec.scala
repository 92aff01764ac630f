package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** [[Ecdf.ecdf]] — brute-force differential, boundary anchors, and
  * partition invariance. */
class EcdfSpec extends SparkSpec {

  test("per-value counts, cumulation, and quotients match brute force") {
    import spark.implicits._
    val rnd = new scala.util.Random(97)
    val values = Seq.fill(400)(rnd.nextInt(30).toLong)
    val got = Ecdf.ecdf(values.toDF("x").repartition(5), col("x"))
      .collect()
      .map(r => r.getAs[Long]("v") ->
        (r.getAs[Long]("cnt"), r.getAs[Long]("cum_le"),
          r.getAs[Double]("ecdf")))
      .toMap
    assert(got.keySet === values.distinct.toSet)
    values.distinct.foreach { v =>
      val cnt = values.count(_ == v).toLong
      val le = values.count(_ <= v).toLong
      val (gc, gl, ge) = got(v)
      assert(gc === cnt, s"v=$v")
      assert(gl === le, s"v=$v")
      assert(ge === le.toDouble / values.size, s"v=$v")
    }
    // the maximum value closes the CDF at exactly 1
    assert(got(values.max)._3 === 1.0)
  }

  test("partitioning-invariant") {
    import spark.implicits._
    val rnd = new scala.util.Random(101)
    val values = Seq.fill(250)(rnd.nextInt(20).toLong)
    val a = Ecdf.ecdf(values.toDF("x").coalesce(1), col("x"))
      .orderBy(col("v")).collect().toSeq
    val b = Ecdf.ecdf(values.toDF("x").repartition(6), col("x"))
      .orderBy(col("v")).collect().toSeq
    assert(a === b)
  }
}
