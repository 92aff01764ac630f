package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.streaming._

/** Streaming gap-based sessionization with EVENT-TIME TIMERS on
  * Spark 4's `transformWithState` — the timer-driven side of the
  * arbitrary-state API that [[StreamingTopK]]'s ValueState fold does
  * not touch: a session closes when the WATERMARK passes its last
  * event + gap, not when the next event happens to arrive, so idle
  * keys emit without waiting for their own traffic (the property
  * `flatMapGroupsWithState`-based sessionization only gets from
  * GroupStateTimeout and that batch jobs cannot express at all).
  *
  * Determinism discipline: all session algebra runs on LONG event-time
  * MICROSECONDS (`unix_micros` — never wall clock, never the
  * millisecond-truncated timer clock); the gap rule is the batch
  * convention (`ts − last > gap` starts a new session, ties extend).
  * Under in-order chronological replay (time-range-partitioned files,
  * one per trigger, delay-0 watermark), late data is impossible, a
  * pending timer can never fire while its session is still
  * extendable, and the emitted set EQUALS batch sessionization — the
  * oracle hash-pins it session-for-session. Timers are mechanism, not
  * semantics: expiry timestamps only decide WHEN a close is noticed.
  *
  * Scale shape (100 TB stream): state per key is one fixed-width
  * session summary + one registered timer, independent of stream
  * length; each micro-batch touches only keys with events or expiring
  * timers. The RocksDB provider keeps the key space off-heap.
  */
object SessionTimers {

  /** One input event; `us` = event time in unix microseconds. The
    * `ts` timestamp column must ALSO survive on the streaming Dataset
    * for the watermark. */
  case class SessEvent(user: Long, ts: java.sql.Timestamp, us: Long,
      cents: Long)

  /** Per-key open session: [startUs, lastUs], counts, and the expiry
    * (ms) of the currently registered timer — kept in state so a
    * stale timer that survived a re-registration race is ignored. */
  case class SessState(startUs: Long, lastUs: Long, n: Long,
      cents: Long, expiryMs: Long)

  /** One closed session. */
  case class SessEmit(user: Long, start_us: Long, end_us: Long,
      n_events: Long, sum_cents: Long)

  /** Event-time sessionizer: inline closes when a same-key event
    * overshoots the gap, timer closes when the watermark does. */
  class SessionProcessor(gapUs: Long)
      extends StatefulProcessor[Long, SessEvent, SessEmit] {

    @transient private var state: ValueState[SessState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[SessState](
        "session", Encoders.product[SessState], TTLConfig.NONE)

    private def expiryOf(lastUs: Long): Long = lastUs / 1000L + gapUs / 1000L + 10L

    override def handleInputRows(
        key: Long,
        rows: Iterator[SessEvent],
        timerValues: TimerValues): Iterator[SessEmit] = {
      val sorted = rows.toSeq.sortBy(e => (e.us, e.cents))
      var cur = Option(state.get())
      val closed = scala.collection.mutable.ArrayBuffer.empty[SessEmit]
      sorted.foreach { e =>
        cur match {
          case Some(s) if e.us - s.lastUs > gapUs =>
            closed += SessEmit(key, s.startUs, s.lastUs, s.n, s.cents)
            cur = Some(SessState(e.us, e.us, 1L, e.cents, 0L))
          case Some(s) =>
            cur = Some(SessState(s.startUs, math.max(s.lastUs, e.us),
              s.n + 1L, s.cents + e.cents, s.expiryMs))
          case None =>
            cur = Some(SessState(e.us, e.us, 1L, e.cents, 0L))
        }
      }
      cur.foreach { s =>
        // one live timer per key: re-arm to the current session's close
        if (s.expiryMs > 0L) getHandle.deleteTimer(s.expiryMs)
        val expiry = expiryOf(s.lastUs)
        getHandle.registerTimer(expiry)
        state.update(SessState(s.startUs, s.lastUs, s.n, s.cents, expiry))
      }
      closed.iterator
    }

    override def handleExpiredTimer(
        key: Long,
        timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[SessEmit] = {
      val s = state.get()
      // a stale timer (superseded by a later event's re-arm) is a no-op
      if (s != null && expiredTimerInfo.getExpiryTimeInMs() >= s.expiryMs) {
        state.clear()
        Iterator.single(
          SessEmit(key, s.startUs, s.lastUs, s.n, s.cents))
      } else Iterator.empty
    }
  }

  /** Run the sessionizer over a watermarked micro-batched source and
    * return every closed session. The RocksDB provider (required by
    * transformWithState) is scoped to this query and restored
    * after. */
  def closedSessions(
      spark: SparkSession,
      source: Dataset[SessEvent],
      gapUs: Long,
      queryName: String,
      checkpointDir: Option[String] = None): DataFrame = {
    import spark.implicits._
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "org.apache.spark.sql.execution.streaming." +
      "state.RocksDBStateStoreProvider")
    try {
      val ws = source.withWatermark("ts", "0 seconds")
        .groupByKey(_.user)
        .transformWithState(new SessionProcessor(gapUs),
          TimeMode.EventTime(), OutputMode.Append())
        .writeStream.outputMode("append").format("memory")
        .queryName(queryName)
        .trigger(Trigger.AvailableNow())
      // explicit checkpoint under the caller's scratch dir — the
      // implicit temporary checkpoint pays java.io.tmpdir's per-commit
      // sync tax once per micro-batch (TempWork.scratchBase rationale)
      checkpointDir.fold(ws)(d => ws.option("checkpointLocation", d))
        .start().awaitTermination()
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None    => spark.conf.unset(key)
      }
    }
    spark.table(queryName)
  }
}
