package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** [[IncrementalJoin.deltaInner]] — the bag-semantics delta identity
  * under random splits, multiplicities included. */
class IncrementalJoinSpec extends SparkSpec {

  test("old view + delta equals the full re-join as a BAG, under " +
    "several random splits, duplicate keys included") {
    import spark.implicits._
    val rnd = new scala.util.Random(223)
    val rRows = Seq.fill(300)((rnd.nextInt(40).toLong, rnd.nextInt(100)))
    val sRows = Seq.fill(200)((rnd.nextInt(40).toLong, rnd.nextInt(100)))
    Seq(42, 43, 44).foreach { seed =>
      val split = new scala.util.Random(seed)
      val (rOld, rNew) = rRows.partition(_ => split.nextBoolean())
      val (sOld, sNew) = sRows.partition(_ => split.nextBoolean())
      val r = rOld.toDF("k", "a").repartition(3)
      val dr = rNew.toDF("k", "a").repartition(2)
      val s = sOld.toDF("k", "b").repartition(3)
      val ds = sNew.toDF("k", "b").repartition(2)
      def bag(df: org.apache.spark.sql.DataFrame): Map[(Long, Int, Int), Long] =
        df.groupBy(col("k"), col("a"), col("b"))
          .agg(count(lit(1)).as("c")).collect()
          .map(x => (x.getLong(0), x.getInt(1), x.getInt(2)) ->
            x.getLong(3)).toMap
      val maintained = bag(r.join(s, Seq("k")).unionByName(
        IncrementalJoin.deltaInner(r, dr, s, ds, Seq("k"))))
      val full = bag(rRows.toDF("k", "a").join(
        sRows.toDF("k", "b"), Seq("k")))
      assert(maintained === full, s"seed $seed")
    }
  }

  test("empty deltas contribute nothing; a delta key missing from the " +
    "base joins only within the delta") {
    import spark.implicits._
    val r = Seq((1L, 10)).toDF("k", "a")
    val s = Seq((1L, 20)).toDF("k", "b")
    val empty = Seq.empty[(Long, Int)].toDF("k", "a")
    assert(IncrementalJoin.deltaInner(r, empty, s,
      Seq.empty[(Long, Int)].toDF("k", "b"), Seq("k")).count() === 0L)
    val dr = Seq((9L, 11)).toDF("k", "a")
    val ds = Seq((9L, 21)).toDF("k", "b")
    val delta = IncrementalJoin.deltaInner(r, dr, s, ds, Seq("k"))
      .collect().map(x => (x.getLong(0), x.getInt(1), x.getInt(2)))
    assert(delta.toSeq === Seq((9L, 11, 21)))
  }
}
