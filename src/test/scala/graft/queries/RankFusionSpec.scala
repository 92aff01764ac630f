package graft.queries

import graft.SparkSpec
import graft.operators.RankFusion

class RankFusionSpec extends SparkSpec {
  import spark.implicits._

  private def rrf(rank: Long, k0: Long = 60L): Long =
    math.round(1e12 / (k0 + rank))

  test("items in both lists outrank single-list items; scores are exact") {
    val a = Seq((10L, 1L), (11L, 2L), (12L, 3L)).toDF("id", "rank")
    val b = Seq((11L, 1L), (13L, 2L), (10L, 3L)).toDF("id", "rank")
    val got = RankFusion.reciprocalRankFusion(Seq(a, b), "id", "rank")
      .as[(Long, Long, Long, Long)].collect().toList
    val expect = Map(
      10L -> (rrf(1) + rrf(3)), 11L -> (rrf(2) + rrf(1)),
      12L -> rrf(3), 13L -> rrf(2))
    assert(got.map(r => r._1 -> r._2).toMap == expect)
    // 11 holds ranks (2,1), 10 holds (1,3): same best rank, but RRF's
    // 1/(k0+r) decay favors the tighter pair — 11 first.
    assert(got.map(_._1) == List(11L, 10L, 13L, 12L))
    assert(got.map(_._4) == List(1L, 2L, 3L, 4L))
    assert(got.filter(r => r._1 == 10L).head._3 == 2L) // n_lists
  }

  test("topK truncates after fusion, not before") {
    val a = (1L to 30L).map(i => (i, i)).toDF("id", "rank")
    val b = Seq((30L, 1L)).toDF("id", "rank")
    val got = RankFusion.reciprocalRankFusion(Seq(a, b), "id", "rank",
      topK = 3).as[(Long, Long, Long, Long)].collect().toList
    // 30 appears at rank 30 in a and rank 1 in b: fused top.
    assert(got.head._1 == 30L)
    assert(got.size == 3)
  }

  test("guards reject empty input and bad parameters") {
    val a = Seq((1L, 1L)).toDF("id", "rank")
    intercept[IllegalArgumentException](
      RankFusion.reciprocalRankFusion(Nil, "id", "rank"))
    intercept[IllegalArgumentException](
      RankFusion.reciprocalRankFusion(Seq(a), "id", "rank", k0 = 0))
    intercept[IllegalArgumentException](
      RankFusion.reciprocalRankFusion(Seq(a), "id", "rank", topK = 0))
  }
}
