package graft.engine

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Physical listen storage: year/month-partitioned parquet with an
  * append-only incremental sibling and read-time deletion retraction.
  *
  * Reference behavior being reproduced (not the implementation):
  *   - base partitioned by year,month from listened_at
  *     (listens/compact.py:27-45)
  *   - incremental appended per dump (listens/dump.py:219-251)
  *   - deleted listens retracted at read time by 4-column anti join;
  *     whole-user history truncation via max_created left join
  *     (listens/data.py:67-86)
  *   - month-range partition pruning for [from, to) windows
  *     (listens/data.py:89-99) — here expressed as predicates on the
  *     partition columns, which Catalyst turns into static partition
  *     pruning; no path gymnastics needed.
  *
  * Scale: partitioning by (year, month) keeps one month's listens per
  * partition directory; a stats window of N months scans exactly N
  * directories regardless of total history size.
  */
final class ListenStore(spark: SparkSession, root: String) {
  private val basePath = s"$root/base"
  private val incPath = s"$root/incremental"
  private val deletedPath = s"$root/deleted-listens"
  private val deletedHistoryPath = s"$root/deleted-user-listen-history"
  private val feedbackPath = s"$root/recording-feedback"

  private def exists(path: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  /** Full rewrite of the base: derive partition columns and write
    * partitioned. Overwrite is atomic-enough for the single-writer batch
    * model (the reference swaps a UUID directory; a cluster deployment
    * would do the same pointer swap). */
  def writeBase(listens: DataFrame): Unit =
    listens
      .withColumn("year", year(col("listened_at")))
      .withColumn("month", month(col("listened_at")))
      .repartition(col("year"), col("month"))
      .write.partitionBy("year", "month").mode("overwrite").parquet(basePath)

  /** Append an incremental dump chunk (reference dump.py:229-233). */
  def appendIncremental(listens: DataFrame): Unit =
    listens.write.mode("append").parquet(incPath)

  /** Record listen deletions; retracted at read time, removed physically at
    * compaction. */
  def appendDeleted(deleted: DataFrame): Unit =
    deleted.write.mode("append").parquet(deletedPath)

  def writeDeletedUserHistory(history: DataFrame): Unit =
    history.repartition(1).write.mode("overwrite").parquet(deletedHistoryPath)

  /** Recording feedback cache (user_id, entity, score; score -1 = hated —
    * reference data/postgres/feedback.py:15-18), consumed by playlist
    * generation. */
  def writeFeedback(feedback: DataFrame): Unit =
    feedback.repartition(1).write.mode("overwrite").parquet(feedbackPath)

  def feedback(schema: org.apache.spark.sql.types.StructType): DataFrame =
    readOrEmpty(feedbackPath, schema)

  private def readOrEmpty(path: String, schema: org.apache.spark.sql.types.StructType): DataFrame =
    if (exists(path)) spark.read.schema(schema).parquet(path)
    else spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)

  def baseListens: DataFrame =
    if (exists(basePath)) spark.read.parquet(basePath).drop("year", "month")
    else spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], Listen.schema)

  def incrementalListens: DataFrame = readOrEmpty(incPath, Listen.schema)

  /** Base-only listens in [from, to), deletions retracted — the input to a
    * cached partial aggregate (incremental listens are aggregated
    * separately by the engine and merged, never rescanned together).
    *
    * The year/month predicates are written against the partition columns so
    * Catalyst prunes partitions statically; the listened_at range filter
    * handles the sub-month boundaries.
    */
  def baseListensRange(from: Timestamp, to: Timestamp): DataFrame = {
    val base =
      if (exists(basePath)) {
        val b = spark.read.parquet(basePath)
        val fromKey = lit(from.toLocalDateTime.getYear * 100 +
          from.toLocalDateTime.getMonthValue)
        val toKey = lit(to.toLocalDateTime.getYear * 100 +
          to.toLocalDateTime.getMonthValue)
        b.filter(col("year") * 100 + col("month") >= fromKey &&
            col("year") * 100 + col("month") <= toKey)
          .drop("year", "month")
      } else baseListens
    retractDeleted(base.filter(
      col("listened_at") >= lit(from) && col("listened_at") < lit(to)))
  }

  /** Listens in [from, to), base ∪ incremental, deletions retracted. */
  def listens(from: Timestamp, to: Timestamp): DataFrame =
    baseListensRange(from, to).unionByName(
      retractDeleted(incrementalListens).filter(
        col("listened_at") >= lit(from) && col("listened_at") < lit(to)))

  /** Read-time deletion semantics (reference listens/data.py:67-86):
    * 4-column anti join for individual deletions, then a left join to the
    * per-user history-truncation watermark keeping rows with no watermark
    * or created above it. */
  def retractDeleted(listens: DataFrame): DataFrame = {
    val afterRows =
      if (exists(deletedPath)) {
        val del = spark.read.parquet(deletedPath)
          .select(Listen.deletionKey.map(col): _*)
        listens.join(del, Listen.deletionKey, "left_anti")
      } else listens
    if (exists(deletedHistoryPath)) {
      val h = spark.read.parquet(deletedHistoryPath)
        .select(col("user_id"), col("max_created"))
      afterRows.join(h, Seq("user_id"), "left")
        .filter(col("max_created").isNull ||
          col("created") > col("max_created"))
        .drop("max_created")
    } else afterRows
  }

  /** Compaction (reference listens/compact.py:13-24): fold incremental into
    * the base, physically drop deleted rows, rewrite partitioned, clear the
    * incremental and deletion side-tables. */
  def compact(): Unit = {
    val merged = retractDeleted(baseListens.unionByName(incrementalListens))
      .localCheckpoint() // sever lineage from the paths about to be rewritten
    writeBase(merged)
    clearSideTables()
  }

  /** Drop the incremental sibling and deletion side tables — after a
    * compaction folded them in, or after a full-dump import superseded
    * them (the reference's new-listens-location swap leaves them behind in
    * the abandoned directory). */
  def clearSideTables(): Unit = {
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    Seq(incPath, deletedPath, deletedHistoryPath).foreach { p =>
      fs.delete(new org.apache.hadoop.fs.Path(p), true)
    }
  }
}
