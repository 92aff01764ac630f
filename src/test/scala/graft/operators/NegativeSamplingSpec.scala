package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** [[NegativeSampling.negatives]] — exclusion guarantee, bounded output,
  * mixer replay against an independent Scala implementation, and
  * partitioning invariance. */
class NegativeSamplingSpec extends SparkSpec {

  private val Mod = 1L << 31

  /** Independent reimplementation of the 31-bit two-round mixer. */
  private def mixRef(u: Long, j: Long, salt: Long): Long = {
    val h0 = ((u % Mod) * 2654435761L + j * 97L + salt) % Mod
    val h1 = ((h0 ^ (h0 >> 15)) * 2246822519L) % Mod
    h1 ^ (h1 >> 13)
  }

  test("mixer column replays the reference arithmetic exactly") {
    import spark.implicits._
    val rows = for (u <- 0L to 40L; j <- 1L to 6L) yield (u, j)
    val got = rows.toDF("u", "j")
      .select(col("u"), col("j"),
        NegativeSampling.mix(col("u"), col("j"), 20240801L).as("h"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    rows.foreach { case (u, j) =>
      assert(got((u, j)) === mixRef(u, j, 20240801L), s"u=$u j=$j")
    }
  }

  test("no sampled item is a positive; at most k per user; draws " +
    "ranked in counter order; items inside the domain") {
    import spark.implicits._
    val users = (0L to 30L).toDF("u")
    // user u's positives: items u % 10, (u+1) % 10 — dense domain of 10
    val pos = (0L to 30L).flatMap(u => Seq((u, u % 10), (u, (u + 1) % 10)))
      .toDF("pu", "pi")
    val got = NegativeSampling.negatives(
      users, col("u"), pos, col("pu"), col("pi"),
      itemCount = 10L, k = 3, m = 8)
    val rows = got.collect().map(r => (r.getAs[Long]("user"),
      r.getAs[Long]("item"), r.getAs[Long]("draw"), r.getAs[Int]("rnk")))
    val posSet = (0L to 30L).flatMap(u =>
      Seq((u, u % 10), (u, (u + 1) % 10))).toSet
    rows.foreach { case (u, item, _, _) =>
      assert(!posSet((u, item)), s"positive leaked: ($u, $item)")
      assert(item >= 0 && item < 10)
    }
    rows.groupBy(_._1).foreach { case (u, rs) =>
      assert(rs.length <= 3, s"user $u got ${rs.length} > k")
      val byRank = rs.sortBy(_._4)
      assert(byRank.map(_._3) === byRank.map(_._3).sorted,
        s"rank order != draw order for $u")
    }
  }

  test("deterministic across partitionings and repeated runs") {
    import spark.implicits._
    val pos = Seq((1L, 2L), (2L, 5L)).toDF("pu", "pi")
    def run(parts: Int) = NegativeSampling.negatives(
      (0L to 200L).toDF("u").repartition(parts), col("u"),
      pos, col("pu"), col("pi"), itemCount = 50L, k = 4, m = 9)
      .orderBy(col("user"), col("rnk"))
      .collect().map(r => (r.getAs[Long]("user"), r.getAs[Long]("item"),
        r.getAs[Long]("draw"))).toSeq
    val a = run(1)
    assert(a === run(8) && a === run(3))
  }
}
