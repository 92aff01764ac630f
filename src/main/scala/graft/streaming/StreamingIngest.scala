package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.engine.ListenStore

/** Continuous ingest into the batch-incremental store — the bridge between
  * the Structured Streaming surface and the reference's dump-driven
  * architecture (SURVEY §2.9). Each micro-batch is treated as one
  * "incremental dump chunk": appended to the store's incremental sibling
  * with the high-water metadata advanced from the chunk alone
  * (listens/dump.py:219-251 + metadata.py:18-55 semantics), so everything
  * downstream — dispatch anchors, only-incremental stat runs, compaction —
  * behaves exactly as if the chunk had arrived as a dump import.
  *
  * Scale: the sink does no store-wide work per batch. `appendIncremental`
  * writes the chunk and folds its 2-column max into the one-row metadata
  * singleton, so ingest cost is O(batch), independent of history size;
  * exactly-once across restarts comes from the checkpointed offsets plus
  * the append-only layout (a replayed batch re-appends rows, which the
  * engine's read-time dedup-free model tolerates the same way re-imported
  * reference dump chunks do — the ledger guards dump-level replays, and
  * the checkpoint guards batch-level ones).
  */
object StreamingIngest {

  /** Start a stream writing `listens` (a streaming DataFrame with the
    * store's listen schema) into `store`'s incremental sibling, one chunk
    * per micro-batch. */
  def intoStore(
      listens: DataFrame, store: ListenStore, checkpointDir: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    listens.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        store.appendIncremental(batch)
      }
      .trigger(trigger)
      .start()
}
