package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** [[Evaluation.aucExact]] — mid-rank tie handling against a
  * brute-force pair count, plus the degenerate anchors. */
class EvaluationSpec extends SparkSpec {

  private def aucOf(rows: Seq[(Long, Long)]): (Long, Long, Double) = {
    import spark.implicits._
    val r = Evaluation.aucExact(
      rows.toDF("score", "label"), col("score"), col("label"))
      .collect()(0)
    (r.getAs[Long]("auc_num"), r.getAs[Long]("auc_den"),
      r.getAs[Double]("auc"))
  }

  /** Brute force: AUC = (concordant + ties/2) / (P·N) over all
    * (pos, neg) pairs — the definition aucExact's rank algebra must
    * reproduce, doubled to stay integral. */
  private def brute(rows: Seq[(Long, Long)]): (Long, Long) = {
    val pos = rows.filter(_._2 == 1L).map(_._1)
    val neg = rows.filter(_._2 == 0L).map(_._1)
    val num = (for (p <- pos; n <- neg) yield {
      if (p > n) 2L else if (p == n) 1L else 0L
    }).sum
    (num, 2L * pos.size * neg.size)
  }

  test("ties get mid-rank credit: matches the pair-counting definition " +
    "on a random fixture with heavy ties") {
    val rnd = new scala.util.Random(17)
    val rows = Seq.fill(500)(
      (rnd.nextInt(12).toLong, if (rnd.nextBoolean()) 1L else 0L))
    val (num, den, auc) = aucOf(rows)
    val (bNum, bDen) = brute(rows)
    assert((num, den) === (bNum, bDen))
    assert(auc === bNum.toDouble / bDen)
  }

  test("perfect separation is 1, reversed separation is 0, all-tied " +
    "scores are exactly 1/2") {
    val perfect = Seq((10L, 1L), (9L, 1L), (2L, 0L), (1L, 0L))
    assert(aucOf(perfect)._3 === 1.0)
    val reversed = perfect.map { case (s, y) => (s, 1L - y) }
    assert(aucOf(reversed)._3 === 0.0)
    val tied = Seq((5L, 1L), (5L, 0L), (5L, 1L), (5L, 0L))
    val (n, dn, a) = aucOf(tied)
    assert(a === 0.5 && 2L * n === dn)
  }

  test("partitioning-invariant: same exact integers at any layout") {
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    val rows = Seq.fill(2000)(
      (rnd.nextInt(40).toLong, if (rnd.nextInt(3) == 0) 1L else 0L))
    val expect = brute(rows)
    for (parts <- Seq(1, 7)) {
      val r = Evaluation.aucExact(
        rows.toDF("score", "label").repartition(parts),
        col("score"), col("label")).collect()(0)
      assert((r.getAs[Long]("auc_num"), r.getAs[Long]("auc_den")) === expect,
        s"parts=$parts")
    }
  }
}
