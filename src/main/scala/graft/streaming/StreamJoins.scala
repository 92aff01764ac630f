package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream joins — the remaining Structured Streaming join shape
  * beside the stream-static watermark join (J6, engine/ListenStore):
  * two live streams equi-keyed with an EVENT-TIME range predicate, the
  * "reaction within T" pattern (click→error, impression→conversion,
  * listen→skip) that batch pipelines express as a self-join and
  * streaming pipelines must express with bounded state.
  *
  * Spark's planner derives the state bound from the watermark plus the
  * time-range condition: a left row can only match right rows in
  * `[leftTs, leftTs + window]`, so once the right watermark passes
  * `leftTs + window` the left row's state is evictable — state is
  * O(rows within watermark + window), never history. That is the whole
  * 100 TB argument: the join never holds the corpus, only the disorder
  * horizon.
  *
  * Correctness vs a batch replay: rows arriving LATER than the
  * watermark delay are dropped by design. Replays with no
  * time-ordering guarantee (file-per-micro-batch over unsorted
  * parquet, backfills) must set `delay` to the full disorder bound —
  * the q189 oracle run uses a delay wider than the dataset's time span
  * so equality with the batch self-join is exact; production sets it
  * to the upstream's lateness SLA and accepts the drop as the
  * documented streaming contract.
  */
object StreamJoins {

  /** Inner-join `left` events to `right` events with the same `keyCol`
    * where `rightTs ∈ [leftTs, leftTs + window]`. Both inputs may be
    * streaming DataFrames; each is watermarked on its own time column
    * with the same `delay`. Column names must be disjoint apart from
    * `keyCol` (the right key is renamed internally).
    */
  def intervalJoin(
      left: DataFrame, right: DataFrame, keyCol: String,
      leftTs: String, rightTs: String, window: String,
      delay: String): DataFrame = {
    require(leftTs != rightTs,
      s"left and right time columns must differ, both were '$leftTs'")
    val l = left.withWatermark(leftTs, delay)
    val r = right.withWatermark(rightTs, delay)
      .withColumnRenamed(keyCol, "__graft_rk")
    l.join(r,
      col(keyCol) === col("__graft_rk") &&
        col(rightTs) >= col(leftTs) &&
        col(rightTs) <= col(leftTs) + expr(s"INTERVAL $window"))
      .drop("__graft_rk")
  }
}
