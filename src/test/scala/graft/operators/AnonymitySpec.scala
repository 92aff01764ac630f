package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** [[Anonymity.audit]] — brute-force class accounting, the k vs l
  * distinction, and edge anchors. */
class AnonymitySpec extends SparkSpec {

  // (qa, qb, sensitive)
  private def run(rows: Seq[(Long, String, Long)], k: Long, l: Long) = {
    import spark.implicits._
    Anonymity.audit(rows.toDF("qa", "qb", "s").repartition(4),
      Seq(col("qa"), col("qb")), col("s"), k, l).collect()(0)
  }

  test("class sizes, diversity counts, and risk shares match brute " +
    "force") {
    val rnd = new scala.util.Random(211)
    val rows = Seq.fill(500)((rnd.nextInt(6).toLong,
      s"m${rnd.nextInt(3)}", rnd.nextInt(4).toLong))
    val (k, l) = (20L, 3L)
    val r = run(rows, k, l)
    val classes = rows.groupBy(t => (t._1, t._2)).values.toSeq
    val belowK = classes.filter(_.size < k)
    val belowL = classes.filter(_.map(_._3).distinct.size < l)
    val risky = classes.filter(c =>
      c.size < k || c.map(_._3).distinct.size < l)
    assert(r.getAs[Long]("n_rows") === 500L)
    assert(r.getAs[Long]("n_classes") === classes.size.toLong)
    assert(r.getAs[Long]("min_class_size") ===
      classes.map(_.size).min.toLong)
    assert(r.getAs[Long]("n_classes_below_k") === belowK.size.toLong)
    assert(r.getAs[Long]("rows_below_k") ===
      belowK.map(_.size).sum.toLong)
    assert(r.getAs[Long]("n_classes_below_l") === belowL.size.toLong)
    assert(r.getAs[Long]("rows_below_l") ===
      belowL.map(_.size).sum.toLong)
    assert(r.getAs[Long]("rows_risky") ===
      risky.map(_.size).sum.toLong)
    assert(r.getAs[Double]("risky_share") ===
      risky.map(_.size).sum.toDouble / 500L)
  }

  test("a large class with a constant sensitive value passes k but " +
    "fails l — the leak k-anonymity alone misses") {
    val rows = Seq.fill(50)((1L, "a", 9L)) ++
      (0 until 50).map(i => (2L, "a", i.toLong))
    val r = run(rows, 10L, 2L)
    assert(r.getAs[Long]("n_classes_below_k") === 0L)
    assert(r.getAs[Long]("n_classes_below_l") === 1L)
    assert(r.getAs[Long]("rows_risky") === 50L)
    assert(r.getAs[Double]("risky_share") === 0.5)
  }

  test("a fully anonymous table reports zero risk") {
    val rows = for (q <- 0L until 3L; i <- 0L until 20L)
      yield (q, "x", i % 5L)
    val r = run(rows, 20L, 5L)
    assert(r.getAs[Long]("rows_risky") === 0L)
    assert(r.getAs[Double]("risky_share") === 0.0)
  }
}
