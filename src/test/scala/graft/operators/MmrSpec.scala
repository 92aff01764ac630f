package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** [[Mmr.rerank]] — brute-force greedy differential, redundancy
  * anchor, λ=1 degradation, and partition invariance. */
class MmrSpec extends SparkSpec {

  private val dim = 4
  private val k = 4

  // (query, item, rel, vec)
  private def fixture(seed: Int, nQ: Int,
      nI: Int): Seq[(Long, Long, Long, Seq[Long])] = {
    val rnd = new scala.util.Random(seed)
    for (q <- 0L until nQ.toLong; i <- 0L until nI.toLong) yield
      (q, i, rnd.nextInt(100).toLong,
        Seq.fill(dim)(rnd.nextInt(9).toLong - 4L))
  }

  private def run(rows: Seq[(Long, Long, Long, Seq[Long])], num: Int,
      den: Int) = {
    import spark.implicits._
    Mmr.rerank(rows.toDF("q", "i", "rel", "v").repartition(4),
      col("q"), col("i"), col("rel"), col("v"), k, num, den)
      .collect()
      .map(r => (r.getAs[Long]("query"), r.getAs[Long]("rank")) ->
        (r.getAs[Long]("item"), r.getAs[Long]("max_sim"),
          r.getAs[Long]("score")))
      .toMap
  }

  /** Driver-side greedy MMR with identical integer algebra. */
  private def brute(rows: Seq[(Long, Long, Long, Seq[Long])], num: Int,
      den: Int): Map[(Long, Long), (Long, Long, Long)] = {
    def dot(a: Seq[Long], b: Seq[Long]): Long =
      a.zip(b).map { case (x, y) => x * y }.sum
    rows.groupBy(_._1).flatMap { case (q, cands) =>
      var selected = List.empty[(Long, Long, Seq[Long])]
      var out = Map.empty[(Long, Long), (Long, Long, Long)]
      (1 to k).foreach { rank =>
        val rem = cands.filterNot(c => selected.exists(_._1 == c._2))
        if (rem.nonEmpty) {
          val scored = rem.map { case (_, i, rel, v) =>
            val ms = if (selected.isEmpty) 0L
              else selected.map(s => dot(v, s._3)).max
            (i, ms, num * rel - (den - num) * ms, v)
          }
          val best = scored.minBy { case (i, _, s, _) => (-s, i) }
          selected = (best._1, best._2, best._4) :: selected
          out += (q, rank.toLong) -> (best._1, best._2, best._3)
        }
      }
      out
    }
  }

  test("selection replays a driver-side greedy MMR exactly, ranks, " +
    "scores, and max-sims included") {
    val rows = fixture(107, nQ = 8, nI = 12)
    assert(run(rows, 1, 2) === brute(rows, 1, 2))
    assert(run(rows, 2, 3) === brute(rows, 2, 3))
  }

  test("an exact-duplicate of the top item is demoted by diversity " +
    "but tops a pure-relevance ranking") {
    import spark.implicits._
    val v1 = Seq(5L, 5L, 5L, 5L)
    val v2 = Seq(-5L, 5L, 0L, 0L)
    val rows = Seq(
      (1L, 10L, 100L, v1), (1L, 11L, 99L, v1), (1L, 12L, 60L, v2))
    val diversified = run(rows, 1, 2)
    assert(diversified((1L, 1L))._1 === 10L)
    assert(diversified((1L, 2L))._1 === 12L, "diversity must demote " +
      "the duplicate")
    val pure = run(rows, 1, 1) // λ = 1: similarity term vanishes
    assert(pure((1L, 2L))._1 === 11L)
  }

  test("λ = 1 reproduces the relevance top-k order exactly") {
    val rows = fixture(109, nQ = 5, nI = 10)
    val got = run(rows, 1, 1)
    rows.groupBy(_._1).foreach { case (q, cands) =>
      val expected = cands.sortBy(c => (-c._3, c._2)).take(k)
      expected.zipWithIndex.foreach { case (c, idx) =>
        assert(got((q, idx + 1L))._1 === c._2, s"query $q rank ${idx + 1}")
      }
    }
  }

  test("partitioning-invariant") {
    import spark.implicits._
    val rows = fixture(113, nQ = 6, nI = 9)
    val a = Mmr.rerank(rows.toDF("q", "i", "rel", "v").coalesce(1),
      col("q"), col("i"), col("rel"), col("v"), k, 1, 2)
      .orderBy(col("query"), col("rank")).collect().toSeq
    val b = Mmr.rerank(rows.toDF("q", "i", "rel", "v").repartition(7),
      col("q"), col("i"), col("rel"), col("v"), k, 1, 2)
      .orderBy(col("query"), col("rank")).collect().toSeq
    assert(a === b)
  }
}
