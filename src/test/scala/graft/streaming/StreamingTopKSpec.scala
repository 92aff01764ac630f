package graft.streaming

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.streaming.StreamingTopK._

/** [[StreamingTopK]] — replay-chunking invariance, at-least-once
  * idempotence (distinct-pair fold), and the mergeTopK total order
  * shared with BoundedTopKAgg. */
class StreamingTopKSpec extends SparkSpec {

  private val events = Seq(
    TopKEvent("a", 1L, 50L), TopKEvent("a", 2L, 70L),
    TopKEvent("a", 3L, 70L), TopKEvent("a", 4L, 10L),
    TopKEvent("a", 5L, 90L), TopKEvent("b", 6L, 5L),
    TopKEvent("b", 7L, 5L), TopKEvent("b", 8L, 1L))

  // k=3 under (weight desc, item asc): a → 5,2,3; b → 6,7,8
  private val expect = Seq(
    ("a", 1L, 5L, 90L), ("a", 2L, 2L, 70L), ("a", 3L, 3L, 70L),
    ("b", 1L, 6L, 5L), ("b", 2L, 7L, 5L), ("b", 3L, 8L, 1L))

  private def replay(
      rows: Seq[TopKEvent], files: Int, name: String)
      : Seq[(String, Long, Long, Long)] = {
    import spark.implicits._
    val work = tmpDir("tws-topk")
    val ds = rows.toDS()
    ds.repartition(files).write.parquet(s"$work/stage")
    val stream = spark.readStream.schema(ds.schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$work/stage")
      .as[TopKEvent]
    StreamingTopK.finalLeaderboard(spark, stream, k = 3, name)
      .orderBy(col("grp"), col("rnk"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
  }

  test("final leaderboard matches the batch total order under any " +
    "replay chunking") {
    assert(replay(events, files = 1, "tws_one") === expect)
    assert(replay(events, files = 4, "tws_four") === expect)
  }

  test("at-least-once idempotence: replayed duplicates cannot occupy " +
    "a second slot") {
    val dup = events ++ events.take(5)
    assert(replay(scala.util.Random.shuffle(dup), 3, "tws_dup") === expect)
  }

  test("mergeTopK: distinct pairs, weight desc / item asc, truncates " +
    "at k, fold order irrelevant") {
    val cur = Seq((9L, 4L), (7L, 1L))
    val add = Seq((7L, 1L), (9L, 2L), (8L, 3L), (1L, 9L))
    val m = mergeTopK(cur, add, 3)
    assert(m === Seq((9L, 2L), (9L, 4L), (8L, 3L)))
    // folding in two steps reaches the same state (bounded-state merge
    // is lossless for top-k: top-k of union = top-k of top-ks)
    val two = mergeTopK(mergeTopK(cur, add.take(2), 3), add.drop(2), 3)
    assert(two === m)
  }

  private def replayWarm(
      warm: Seq[TopKEvent], streamed: Seq[TopKEvent], name: String)
      : Seq[(String, Long, Long, Long)] = {
    import spark.implicits._
    val initial = warm.groupBy(_.grp).toSeq.map { case (g, evs) =>
      val tk = mergeTopK(Seq.empty, evs.map(e => (e.weight, e.item)), 3)
      (g, TopKState(1L, tk.map(_._2).toArray, tk.map(_._1).toArray))
    }.toDS()
    val work = tmpDir("tws-warm")
    val ds = streamed.toDS()
    ds.repartition(2).write.parquet(s"$work/stage")
    val stream = spark.readStream.schema(ds.schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$work/stage")
      .as[TopKEvent]
    StreamingTopK.finalLeaderboardWarm(spark, stream, initial, 3, name)
      .orderBy(col("grp"), col("rnk"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
  }

  test("warm-start: batch standing + streamed increment equals one " +
    "batch over the union") {
    val (warm, streamed) = events.partition(_.item % 2 == 0)
    assert(replayWarm(warm, streamed, "tws_warm") === expect)
  }

  test("warm-start contract: a seeded key never touched by the stream " +
    "emits nothing; an unseeded streamed key starts cold") {
    val warm = Seq(TopKEvent("only_warm", 1L, 9L))
    val streamed = Seq(TopKEvent("cold", 2L, 4L))
    val got = replayWarm(warm, streamed, "tws_warm_edge")
    assert(got === Seq(("cold", 1L, 2L, 4L)))
  }
}
