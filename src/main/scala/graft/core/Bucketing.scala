package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike

/** Bucketed materialization for co-located execution — the shuffle-removal
  * lever the builder brief calls out ("repartition()/bucketing for
  * co-located joins"). A table written with `bucketBy(n, key)` records its
  * hash layout in the catalog; any aggregation grouped on the key and any
  * equi-join between two tables bucketed the same way then satisfies its
  * required distribution straight off the scan — zero Exchange in the
  * plan.
  *
  * Where this pays at 100 TB: the listen store's user-keyed read path. Per
  * -user stats, similarity preprocessing, and the YIM family ALL open with
  * `groupBy(user_id)`; against a plain parquet layout every one of those
  * runs re-shuffles the same fact table on the same key. A user-bucketed
  * materialization pays that shuffle ONCE at write and amortizes it over
  * every downstream run — the same economics as the reference's cached
  * partial aggregates, one level lower.
  *
  * The bucket count is a layout constant (like the reference's fixed
  * year/month partitioning): both sides of a co-located join must agree on
  * it, so changing it means rewriting — pick ceil(totalBytes / targetBytes
  * per bucket) at initial materialization and leave headroom.
  */
object Bucketing {

  private def quoted(table: String): String =
    table.split('.').map(seg => s"`${seg.replace("`", "``")}`").mkString(".")

  /** Write `df` as an external parquet table at `path`, bucketed (and
    * bucket-sorted) by `bucketCols` into `buckets` buckets. Replaces any
    * existing table registration of the same name. Re-materializing under a
    * DIFFERENT path only drops the catalog entry (external tables keep
    * their files); the caller owns deleting the old location, the same way
    * it owns the path choice. */
  def writeBucketed(
      df: DataFrame, path: String, table: String, buckets: Int,
      bucketCols: Seq[String]): Unit = {
    df.sparkSession.sql(s"DROP TABLE IF EXISTS ${quoted(table)}")
    df.write
      .format("parquet")
      .option("path", path)
      .bucketBy(buckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
      .mode("overwrite")
      .saveAsTable(table)
  }

  def read(spark: SparkSession, table: String): DataFrame = spark.table(table)

  /** True when no SHUFFLE exchange remains anywhere in `df`'s physical
    * plan — the property bucketing buys for key-aligned aggs and joins.
    * Matches the `ShuffleExchangeLike` node class exactly, so a broadcast
    * exchange (legitimately shuffle-free) does not trip it. */
  def isExchangeFree(df: DataFrame): Boolean =
    shuffleExchangeCount(df) == 0

  /** Count of shuffle-exchange nodes in the executed plan (AQE-aware). */
  def shuffleExchangeCount(df: DataFrame): Int = {
    val root = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    root.collect { case e: ShuffleExchangeLike => e }.size
  }
}
