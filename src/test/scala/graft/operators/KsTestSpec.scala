package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** [[KsTest.twoSample]] — brute-force sup-CDF-gap differential,
  * identical-sample and disjoint-support anchors, empty-sample
  * degeneracy, partition invariance. */
class KsTestSpec extends SparkSpec {

  private def run(rows: Seq[(Long, Boolean)], parts: Int = 4) = {
    import spark.implicits._
    KsTest.twoSample(
      rows.toDF("s", "g").repartition(parts), col("s"), col("g"))
      .collect()(0)
  }

  private def brute(rows: Seq[(Long, Boolean)]): (Long, Long) = {
    val s1 = rows.filter(_._2).map(_._1)
    val s2 = rows.filterNot(_._2).map(_._1)
    val n1 = s1.size.toLong
    val n2 = s2.size.toLong
    val num = rows.map(_._1).distinct.map { s =>
      math.abs(s1.count(_ <= s) * n2 - s2.count(_ <= s) * n1)
    }.max
    (num, n1 * n2)
  }

  test("random fixture matches the brute-force sup |F1 - F2|") {
    val rnd = new scala.util.Random(67)
    val rows = Seq.fill(600)(
      (rnd.nextInt(40).toLong + (if (rnd.nextBoolean()) 5 else 0),
        rnd.nextBoolean()))
    val r = run(rows)
    val (num, den) = brute(rows)
    assert(r.getAs[Long]("ks_num") === num)
    assert(r.getAs[Long]("ks_den") === den)
    assert(r.getAs[Double]("ks") === num.toDouble / den)
  }

  test("identical samples give D = 0; disjoint supports give D = 1") {
    val same = (1L to 50L).flatMap(i => Seq((i, true), (i, false)))
    assert(run(same).getAs[Long]("ks_num") === 0L)
    val disjoint = (1L to 30L).map(i => (i, true)) ++
      (100L to 140L).map(i => (i, false))
    val r = run(disjoint)
    assert(r.getAs[Double]("ks") === 1.0)
  }

  test("an empty sample yields a null statistic, not an exception; " +
    "result is partitioning-invariant") {
    val oneSided = (1L to 20L).map(i => (i, true))
    val r = run(oneSided)
    assert(r.getAs[Long]("n2") === 0L)
    assert(r.isNullAt(r.fieldIndex("ks")))

    val rnd = new scala.util.Random(71)
    val rows = Seq.fill(300)((rnd.nextInt(25).toLong, rnd.nextBoolean()))
    assert(run(rows, 1).toSeq === run(rows, 17).toSeq)
  }
}
