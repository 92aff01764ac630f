package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.engine.StatsProvider

/** Structured Streaming surface over the stats providers — beyond-parity:
  * the reference handles continuous ingest with batch-incremental re-runs
  * (SURVEY §2.9); this maintains the same partial aggregates continuously.
  *
  * The partial stage of every [[StatsProvider]] is a streaming-compatible
  * hash aggregation (groupBy + count/sum), so the provider contract carries
  * over unchanged: the stream maintains `aggregate`, and `stats` runs on
  * demand against the maintained state — exactly the partial/final split
  * the batch engine uses, now with per-microbatch freshness instead of
  * per-dump.
  */
object StreamingStats {

  /** Maintain a provider's partial aggregate from a parquet-directory
    * stream of listens; `stats` can then be applied to snapshots of the
    * in-memory table `tableName`. Watermarking on `tsCol` bounds state for
    * event-time-windowed providers.
    */
  def maintainPartial(
      spark: SparkSession,
      provider: StatsProvider,
      sourceDir: String,
      schema: org.apache.spark.sql.types.StructType,
      tableName: String,
      tsCol: String,
      watermark: String = "1 day"): StreamingQuery = {
    val stream = spark.readStream.schema(schema).parquet(sourceDir)
      .withWatermark(tsCol, watermark)
    provider.aggregate(stream)
      .writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(tableName)
      .trigger(Trigger.AvailableNow())
      .start()
  }

  /** Final stats over the maintained partial snapshot. */
  def statsSnapshot(
      spark: SparkSession, provider: StatsProvider, tableName: String): DataFrame =
    provider.stats(spark.table(tableName))

  /** Event-time windowed listen counts with a watermark: tumbling
    * `windowDuration` buckets per user, emitted append-mode once the
    * watermark passes the window end — the streaming form of the
    * listening-activity bucket grid (late data beyond the watermark is
    * dropped, exactly the bound that keeps state finite at 100 TB/day). */
  def windowedActivity(
      listens: DataFrame, userCol: String, tsCol: String,
      windowDuration: String, watermark: String): DataFrame =
    listens
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowDuration), col(userCol))
      .agg(count(lit(1)).as("listen_count"))
      .select(col(userCol), col("window.start").as("bucket_start"),
        col("listen_count"))
}

/** Streaming sessionization — the stateful-streaming form of the batch
  * session-id derivation (W6 / SessionSimilarity): consecutive listens of
  * one user belong to one session while gaps stay under `gapMinutes`.
  *
  * Implemented with `flatMapGroupsWithState` + event-time timeout: state
  * per user is the open session; an incoming batch extends or rolls it,
  * closed sessions are emitted append-mode, and the timeout fires to
  * flush a session once the watermark passes its gap horizon — so state
  * per user is O(1) regardless of history length.
  */
object StreamingSessions {
  import org.apache.spark.sql.{Dataset, Encoders}
  import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

  final case class Listen(user_id: Int, ts: java.sql.Timestamp, entity: String)
  final case class OpenSession(
      start: Long, end: Long, nListens: Long, entities: Set[String])
  final case class Session(
      user_id: Int, session_start: java.sql.Timestamp,
      session_end: java.sql.Timestamp, n_listens: Long, n_entities: Int)

  private def toSession(u: Int, s: OpenSession): Session = Session(
    u, new java.sql.Timestamp(s.start), new java.sql.Timestamp(s.end),
    s.nListens, s.entities.size)

  def sessionize(
      listens: Dataset[Listen], gapMinutes: Int,
      watermark: String): Dataset[Session] = {
    val gapMs = gapMinutes * 60000L
    implicit val sessionEnc = Encoders.product[Session]
    implicit val stateEnc = Encoders.product[OpenSession]

    def update(
        user: Int, events: Iterator[Listen],
        state: GroupState[OpenSession]): Iterator[Session] = {
      if (state.hasTimedOut) {
        // watermark passed the gap horizon: the open session is final
        val closed = state.getOption.map(toSession(user, _))
        state.remove()
        return closed.iterator
      }
      val sorted = events.toSeq.sortBy(_.ts.getTime)
      var open = state.getOption
      val closed = Seq.newBuilder[Session]
      sorted.foreach { e =>
        val t = e.ts.getTime
        open match {
          case Some(s) if t - s.end <= gapMs =>
            open = Some(OpenSession(s.start, math.max(s.end, t),
              s.nListens + 1, s.entities + e.entity))
          case Some(s) => // gap exceeded: roll the session
            closed += toSession(user, s)
            open = Some(OpenSession(t, t, 1, Set(e.entity)))
          case None =>
            open = Some(OpenSession(t, t, 1, Set(e.entity)))
        }
      }
      open.foreach { s =>
        state.update(s)
        state.setTimeoutTimestamp(s.end + gapMs)
      }
      closed.result().iterator
    }

    listens
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)(Encoders.scalaInt)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(update)
  }
}
