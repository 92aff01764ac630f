package graft

import org.apache.spark.sql.functions._
import graft.core.StateTable

/** [[graft.core.StateTable]] — the size-gated placement primitive the
  * graph/dedup operators share (round-13 port of the RandomWalks tabled
  * gate): pin-below / stage-above semantics, release lifecycles, and
  * session-unique bucketed-table naming. */
class StateTableSpec extends SparkSpec {
  import spark.implicits._

  test("pinOrStage below the gate pins (no surviving stage files) and " +
    "release unpins") {
    val df = (1L to 100L).map(i => (i, i % 7)).toDF("k", "v")
    val placed = StateTable.pinOrStage(df, Seq(col("k")), "sts_small",
      gateRows = 1000L)
    // pinned form: lineage-truncated LogicalRDD, rows intact
    assert(placed.df.queryExecution.analyzed
      .isInstanceOf[org.apache.spark.sql.execution.LogicalRDD])
    assert(placed.df.count() === 100L)
    assert(placed.df.agg(sum(col("v"))).head.getLong(0) ===
      (1L to 100L).map(_ % 7).sum)
    placed.release() // unpin — must not throw
  }

  test("pinOrStage at/above the gate stages to parquet (scan, not pin) " +
    "and release deletes the tree") {
    val df = (1L to 100L).map(i => (i, s"x$i")).toDF("k", "s")
    val placed = StateTable.pinOrStage(df, Seq(col("k")), "sts_big",
      gateRows = 10L)
    assert(!placed.df.queryExecution.analyzed
      .isInstanceOf[org.apache.spark.sql.execution.LogicalRDD])
    val got = placed.df.as[(Long, String)].collect().toSet
    assert(got === (1L to 100L).map(i => (i, s"x$i")).toSet)
    // the staged scan reads real files; release removes them
    val files = placed.df.inputFiles
    assert(files.nonEmpty)
    placed.release()
    assert(!files.exists(f =>
      java.nio.file.Files.exists(
        java.nio.file.Paths.get(f.stripPrefix("file:")))))
  }

  test("pinOrStage executes the upstream plan exactly once") {
    val counter = spark.sparkContext.longAccumulator("sts_once")
    val df = (1L to 50L).toDF("k")
      .filter(udfTouch(counter)(col("k")))
    // staged branch: one write job over the plan, counts from metadata
    val placed = StateTable.pinOrStage(df, Nil, "sts_once", gateRows = 1L)
    assert(placed.df.count() === 50L)
    assert(placed.df.count() === 50L) // second consumer: scan, no recompute
    assert(counter.value === 50L,
      s"upstream executed ${counter.value / 50} times, want exactly 1")
    placed.release()
  }

  test("pinOrStage reports the placement's measured row count in both " +
    "regimes") {
    val df = (1L to 80L).map(i => (i, i % 3)).toDF("k", "v")
    val pinned = StateTable.pinOrStage(df, Seq(col("k")), "sts_rows_p",
      gateRows = 1000L)
    assert(pinned.rows === 80L)
    pinned.release()
    val staged = StateTable.pinOrStage(df, Seq(col("k")), "sts_rows_s",
      gateRows = 10L)
    assert(staged.rows === 80L)
    staged.release()
  }

  test("pinOrStage with a sound below-gate upper bound pins directly — " +
    "no stage round-trip, one upstream execution, exact rows") {
    val counter = spark.sparkContext.longAccumulator("sts_bound")
    val df = (1L to 60L).toDF("k").filter(udfTouch(counter)(col("k")))
    val placed = StateTable.pinOrStage(df, Seq(col("k")), "sts_bound",
      gateRows = 1000L, upperBoundRows = 100L)
    // direct pin: lineage-truncated, no staged parquet scan behind it
    assert(placed.df.queryExecution.analyzed
      .isInstanceOf[org.apache.spark.sql.execution.LogicalRDD])
    assert(placed.rows === 60L)
    assert(placed.df.count() === 60L)
    assert(counter.value === 60L,
      s"upstream executed ${counter.value / 60} times, want exactly 1")
    placed.release()
  }

  test("pinOrStage ignores an at/above-gate upper bound and stages") {
    val df = (1L to 50L).map(i => (i, s"y$i")).toDF("k", "s")
    val placed = StateTable.pinOrStage(df, Seq(col("k")), "sts_bound_big",
      gateRows = 10L, upperBoundRows = 50L)
    assert(!placed.df.queryExecution.analyzed
      .isInstanceOf[org.apache.spark.sql.execution.LogicalRDD])
    assert(placed.rows === 50L)
    placed.release()
  }

  test("bucketed tables get session-unique names, scan exchange-free " +
    "on the bucket key, and drop() removes catalog entry + files") {
    val df = (1L to 200L).map(i => (i % 20, i)).toDF("g", "v")
    val t1 = StateTable.bucketedAtWidth(df, Seq("g"), 4, "sts_tbl")
    val t2 = StateTable.bucketedAtWidth(df, Seq("g"), 4, "sts_tbl")
    assert(t1.table !== t2.table, "two materializations must not collide")
    assert(t1.table.contains(
      spark.sparkContext.applicationId.replaceAll("[^A-Za-z0-9]", "_")),
      "table name must carry the application id")
    // a groupBy on the bucket key plans with zero shuffle exchanges
    val agg = t1.df.groupBy(col("g")).agg(sum(col("v")).as("s"))
    assert(graft.core.Bucketing.isExchangeFree(agg),
      "bucket-key aggregate must be exchange-free")
    assert(agg.collect().length === 20)
    val files = t1.df.inputFiles
    t1.drop()
    t2.drop()
    assert(!spark.catalog.tableExists(t1.table))
    assert(!files.exists(f =>
      java.nio.file.Files.exists(
        java.nio.file.Paths.get(f.stripPrefix("file:")))))
  }

  private def udfTouch(acc: org.apache.spark.util.LongAccumulator) =
    udf { (_: Long) => acc.add(1L); true }
}
