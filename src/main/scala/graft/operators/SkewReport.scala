package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Join/aggregation-key skew diagnostic — the measurement that decides
  * whether a key needs [[graft.core.Salting]] buckets or an AQE skew
  * split BEFORE the job that would discover it the hard way: the top-N
  * heaviest keys of a column with each key's share of all rows and its
  * ratio to the mean key load.
  *
  * Exactness: counts are exact longs; `share` = cnt / total and
  * `vs_mean` = cnt × n_keys / total are single IEEE double divisions of
  * exact integers (the q183 rational-score discipline), so the whole
  * report is hash-exact cross-engine — a diagnostic an oracle can gate.
  *
  * Scale shape (100 TB): one key-count aggregation with map-side
  * combine (exchange bounded by distinct keys), two scalar anchors
  * (total rows, key cardinality — one number each to the driver), and a
  * distributed `TakeOrderedAndProject` for the top-N — never a global
  * sort, never a single-partition window over the key space; the rank
  * window runs over N collected rows only. Null keys count as a key
  * (they hash to one reducer like any other value — the classic hidden
  * hot key) and surface in the report as null.
  */
object SkewReport {

  /** Top-N heaviest values of `keyCol`: (key as string, cnt, share,
    * vs_mean, key_rank), rank by (cnt desc, key asc nulls first —
    * deterministic). */
  def topKeys(
      df: DataFrame, keyCol: String, topN: Int = 20): DataFrame = {
    require(topN >= 1, s"topN must be >= 1, got $topN")
    val counts = df.groupBy(col(keyCol).cast("string").as("key"))
      .agg(count(lit(1)).as("cnt"))
    val anchors = counts.agg(
      sum(col("cnt")).as("total"), count(lit(1)).as("n_keys"))
      .collect()(0)
    val (total, nKeys) = (anchors.getLong(0), anchors.getLong(1))
    counts
      .orderBy(col("cnt").desc, col("key").asc_nulls_first)
      .limit(topN)
      .withColumn("share", col("cnt") / lit(total))
      .withColumn("vs_mean", (col("cnt") * lit(nKeys)) / lit(total))
      .withColumn("key_rank", row_number().over(
        Window.orderBy(col("cnt").desc, col("key").asc_nulls_first))
        .cast("long"))
  }
}
