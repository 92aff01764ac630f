package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.streaming._

/** Streaming per-group top-k maintained with Spark 4's
  * `transformWithState` arbitrary-state API — the successor of
  * `flatMapGroupsWithState` (which [[StreamingStats]] uses for
  * sessionization): typed per-key state handles (`ValueState` here),
  * RocksDB-backed state store, TTL-capable, state schema tracked by
  * the store.
  *
  * Semantics mirror [[graft.functions.BoundedTopKAgg]] exactly: per
  * group, the k best `(weight, item)` pairs under (weight desc, item
  * asc), DISTINCT on the exact pair — so a replayed event cannot
  * occupy a second slot, making the operator idempotent under
  * at-least-once delivery. Every micro-batch folds its rows into the
  * k-bounded state and emits the group's current ranked top-k stamped
  * with a per-key monotone `seq`; the final answer is each group's
  * max-seq emission (no wall clock — deterministic under any replay
  * chunking, which the spec pins).
  *
  * Scale shape (100 TB stream): state per key is exactly k pairs + a
  * counter, independent of stream length; the update is O(batch log k).
  * The emitted stream is O(k) per touched key per batch — downstream
  * consumers see a changelog of leaderboards, the "top sellers right
  * now" surface the reference recomputes in batch
  * (stats/user/entity.py top-N) graduated to continuous maintenance.
  */
object StreamingTopK {

  /** One input event: group, item id, integer weight (cents/counts —
    * the engine's integer-exact discipline). */
  case class TopKEvent(grp: String, item: Long, weight: Long)

  /** Bounded per-key state: parallel arrays (Encoders.product-friendly)
    * of the current top-k pairs, best-first, plus the emission
    * counter. */
  case class TopKState(seq: Long, items: Array[Long], weights: Array[Long])

  /** One emitted leaderboard row; `seq` is the per-key version — the
    * final leaderboard is the max-seq slice per group. */
  case class TopKEmit(grp: String, seq: Long, rnk: Int, item: Long,
      weight: Long)

  /** Fold `add` into a best-first top-k pair list: distinct (weight,
    * item) pairs, ordered weight desc then item asc, truncated at k —
    * the same total order as BoundedTopKAgg. */
  def mergeTopK(
      cur: Seq[(Long, Long)],
      add: Seq[(Long, Long)],
      k: Int): Seq[(Long, Long)] =
    (cur ++ add).distinct
      .sortBy { case (w, item) => (-w, item) }
      .take(k)

  /** The stateful processor. Registered state: one ValueState holding
    * [[TopKState]] (no TTL — leaderboards don't expire; pass a TTL via
    * the handle to age keys out at the store level if they should). */
  class TopKProcessor(k: Int)
      extends StatefulProcessor[String, TopKEvent, TopKEmit] {

    @transient private var state: ValueState[TopKState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[TopKState](
        "topk", Encoders.product[TopKState], TTLConfig.NONE)

    override def handleInputRows(
        key: String,
        rows: Iterator[TopKEvent],
        timerValues: TimerValues): Iterator[TopKEmit] = {
      val prev = Option(state.get())
      val cur = prev.map(s => s.weights.zip(s.items).toSeq)
        .getOrElse(Seq.empty)
      val merged = mergeTopK(
        cur, rows.map(e => (e.weight, e.item)).toSeq, k)
      val seq = prev.map(_.seq).getOrElse(0L) + 1L
      state.update(TopKState(seq,
        merged.map(_._2).toArray, merged.map(_._1).toArray))
      merged.iterator.zipWithIndex.map { case ((w, item), i) =>
        TopKEmit(key, seq, i + 1, item, w)
      }
    }
  }

  /** Run the changelog over a micro-batched source and return the
    * final leaderboard per group: (grp, rnk, item, weight). The
    * RocksDB state-store provider (required by transformWithState) is
    * scoped to this query via the session conf and restored after. */
  def finalLeaderboard(
      spark: SparkSession,
      source: Dataset[TopKEvent],
      k: Int,
      queryName: String,
      checkpointDir: Option[String] = None)
      : org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "org.apache.spark.sql.execution.streaming." +
      "state.RocksDBStateStoreProvider")
    try {
      val ws = source.groupByKey(_.grp)
        .transformWithState(new TopKProcessor(k),
          TimeMode.None(), OutputMode.Update())
        .writeStream.outputMode("update").format("memory")
        .queryName(queryName)
        .trigger(Trigger.AvailableNow())
      // explicit checkpoint under the caller's scratch dir: the implicit
      // "temporary" checkpoint lands on java.io.tmpdir, whose per-commit
      // sync tax the offset/commit/state logs pay once per micro-batch
      // (TempWork.scratchBase rationale); callers pass their TempWork
      // tree so the logs ride the fast scratch volume instead
      checkpointDir.fold(ws)(d => ws.option("checkpointLocation", d))
        .start().awaitTermination()
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None    => spark.conf.unset(key)
      }
    }
    val log = spark.table(queryName)
    val last = log.groupBy(col("grp").as("g"))
      .agg(max(col("seq")).as("maxseq"))
    log.join(last, col("grp") === col("g") && col("seq") === col("maxseq"))
      .select(col("grp"), col("rnk").cast("long").as("rnk"),
        col("item"), col("weight"))
  }

  /** [[TopKProcessor]] with WARM-START: the batch-computed standing
    * seeds the state store before the first micro-batch
    * (`StatefulProcessorWithInitialState` — the batch→streaming
    * migration path: cut over a nightly top-k job to continuous
    * maintenance without replaying history). `handleInitialState`
    * runs once per key carrying initial state; the fold thereafter is
    * identical, so warm-start + increment ≡ one batch over the union
    * — which is exactly what the q261 oracle pins. Keys seeded but
    * never touched by the stream emit nothing (the changelog
    * contract); stream every key at least once or read the store. */
  class WarmTopKProcessor(k: Int)
      extends StatefulProcessorWithInitialState[
        String, TopKEvent, TopKEmit, TopKState] {

    @transient private var state: ValueState[TopKState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[TopKState](
        "topk", Encoders.product[TopKState], TTLConfig.NONE)

    override def handleInitialState(
        key: String, initialState: TopKState,
        timerValues: TimerValues): Unit =
      state.update(initialState)

    override def handleInputRows(
        key: String,
        rows: Iterator[TopKEvent],
        timerValues: TimerValues): Iterator[TopKEmit] = {
      val prev = Option(state.get())
      val cur = prev.map(s => s.weights.zip(s.items).toSeq)
        .getOrElse(Seq.empty)
      val merged = mergeTopK(
        cur, rows.map(e => (e.weight, e.item)).toSeq, k)
      val seq = prev.map(_.seq).getOrElse(0L) + 1L
      state.update(TopKState(seq,
        merged.map(_._2).toArray, merged.map(_._1).toArray))
      merged.iterator.zipWithIndex.map { case ((w, item), i) =>
        TopKEmit(key, seq, i + 1, item, w)
      }
    }
  }

  /** [[finalLeaderboard]] with a warm-start standing: `initial` is
    * one [[TopKState]] per group (build it with the batch
    * `BoundedTopKAgg` — the two implement one total order). */
  def finalLeaderboardWarm(
      spark: SparkSession,
      source: Dataset[TopKEvent],
      initial: Dataset[(String, TopKState)],
      k: Int,
      queryName: String,
      checkpointDir: Option[String] = None)
      : org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "org.apache.spark.sql.execution.streaming." +
      "state.RocksDBStateStoreProvider")
    try {
      val ws = source.groupByKey(_.grp)
        .transformWithState(new WarmTopKProcessor(k),
          TimeMode.None(), OutputMode.Update(),
          initial.groupByKey(_._1).mapValues(_._2))
        .writeStream.outputMode("update").format("memory")
        .queryName(queryName)
        .trigger(Trigger.AvailableNow())
      // same checkpoint placement rationale as [[finalLeaderboard]]
      checkpointDir.fold(ws)(d => ws.option("checkpointLocation", d))
        .start().awaitTermination()
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None    => spark.conf.unset(key)
      }
    }
    val log = spark.table(queryName)
    val last = log.groupBy(col("grp").as("g"))
      .agg(max(col("seq")).as("maxseq"))
    log.join(last, col("grp") === col("g") && col("seq") === col("maxseq"))
      .select(col("grp"), col("rnk").cast("long").as("rnk"),
        col("item"), col("weight"))
  }
}
