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
}
