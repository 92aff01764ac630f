package graft.similarity

import org.apache.spark.sql.functions._
import graft.SparkSpec

class SharedNeighborsSpec extends SparkSpec {

  // fixture engineered to exercise every coverage regime at once:
  //  - users 1-8: dense overlap (well over k neighbors at shared >= 2)
  //  - users 20-23: exactly one strong neighbor each (< k survivors —
  //    tail users whose remaining top-k slots are shared=1 pairs the
  //    threshold prunes)
  //  - user 30: shares only SINGLE items with everyone (zero survivors
  //    at minShared=2 — a pure-tail user invisible to the finder)
  //  - user 40: isolated (no co-listeners at all — appears in neither)
  private def presence = {
    import spark.implicits._
    val dense = for {
      u <- 1 to 8; i <- 1 to 12 if (u + i) % 3 != 0
    } yield (u.toLong, i.toLong)
    val pairsOnly = Seq(
      (20L, 100L), (20L, 101L), (21L, 100L), (21L, 101L), // 20~21 share 2
      (22L, 102L), (22L, 103L), (23L, 102L), (23L, 103L), // 22~23 share 2
      (20L, 1L), (22L, 2L)) // plus one shared-1 bridge each into dense
    val singles = Seq((30L, 1L), (30L, 100L), (30L, 102L))
    val isolated = Seq((40L, 999L))
    (dense ++ pairsOnly ++ singles ++ isolated).toDF("user_id", "item_id")
  }

  private def run(minShared: Long, k: Int = 3) =
    SharedNeighbors.topK(presence.transform(graft.core.Pin.apply),
        "user_id", "item_id", k, minShared, pairChunks = 3)
      .orderBy(col("user_id"), col("other_user_id"))
      .collect().toSeq

  test("thresholded finder + tail fallback ≡ unthresholded exact top-k") {
    val exact = run(minShared = 1)
    assert(exact.nonEmpty)
    assert(run(minShared = 2) == exact)
    assert(run(minShared = 3) == exact)
    // a threshold above every pair's shared count sends EVERYONE to
    // the tail — still exact
    assert(run(minShared = 1000) == exact)
  }

  test("tail users keep their sub-threshold neighbors; isolated users " +
      "emit nothing") {
    val got = run(minShared = 2).map(r =>
      (r.getLong(0), r.getLong(1))).groupBy(_._1)
    // user 30's pairs are all shared=1 — pruned by the finder, fully
    // recovered by the tail recompute
    assert(got(30L).map(_._2).sorted.nonEmpty)
    // user 40 co-listens with nobody: absent entirely
    assert(!got.contains(40L))
    // user 20: the strong (shared=2) neighbor 21 must be kept
    assert(got(20L).map(_._2).contains(21L))
  }
}
