package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Disk-backed placement for corpus-sized operator state — the shared
  * form of the gate [[graft.operators.RandomWalks]] proved in round 12.
  *
  * Why placement is a GATE and not a constant: a corpus-sized block pin
  * ([[Pin]]) is a CLUSTER-STORAGE budget with a hard failure mode — the
  * round-12 100× probe under 2×4 GiB real executors died writing a
  * ~2 GiB-per-executor adjacency cache (storage at its cap, heap OOM,
  * executor death), and localCheckpoint blocks have no lineage, so the
  * death aborts the job unrecoverably
  * (CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND; SCALE.md round 12). Below the
  * gate, pinning is strictly faster (zero disk round-trips, zero write
  * jobs) and the state is bounded, so small inputs keep it. At or above
  * the gate, state moves to local-disk parquet: re-reads stream through
  * the vectorized scan, executor storage holds NOTHING corpus-sized,
  * and an executor loss costs a task retry, not the job. Measured:
  * q210's tabled form ran 288.5 s green on the exact 4 GiB tier that
  * OOMed its pinned form (zero executor deaths).
  *
  * Two shapes, matching what the consumer needs:
  *   - [[bucketed]] — a hash-bucketed, bucket-sorted catalog table, for
  *     state an iterative operator re-JOINS or re-GROUPS on the bucket
  *     key every round (adjacency lists, peel state): every key-aligned
  *     consumer gets an exchange-free, sort-free scan side — disk-backed
  *     parity with the `repartition(width, key).sortWithinPartitions`
  *     layout the pinned form preserves.
  *   - [[stage]] — a plain parquet dir with 16 MB row groups
  *     (OPERATIONS.md §2: re-read state keeps reader buffers small),
  *     for state whose consumers shuffle on non-layout keys anyway
  *     (candidate pairs, frontier steps, canonical edge sets): bucketing
  *     would buy no exchange, so it skips the catalog entirely.
  *
  * Paths live under [[TempWork]] — on a real cluster that root is the
  * orchestrator-owned distributed workDir (TempWork's caveat); catalog
  * names are qualified by the Spark application id, so a persistent
  * metastore shared by concurrent or successive sessions cannot collide
  * (a per-JVM counter alone would silently DROP a prior session's
  * registration of the same name).
  */
object StateTable {

  /** Default placement gate, in measured (or upper-bound) state rows —
    * the RandomWalks constant: 16M adjacency rows is ~the point where
    * the pinned working set starts to rival a production executor's
    * storage share. Operators expose it as a parameter so specs can
    * force the tabled regime on toy graphs. */
  val DefaultGateRows: Long = 16L * 1000 * 1000

  private val seq = new java.util.concurrent.atomic.AtomicLong(0)

  /** Session-unique catalog name: application id + per-JVM sequence. */
  private def tableName(spark: SparkSession, prefix: String): String = {
    val app = spark.sparkContext.applicationId
      .replaceAll("[^A-Za-z0-9]", "_")
    s"graft_${prefix}_${app}_${seq.getAndIncrement()}"
  }

  /** ceil(rows / rowsPerTask), clamped to [session width, 4096] — the
    * engine's measured-width formula (bounds every task's frame by
    * rowsPerTask regardless of input size; the clamp keeps arbitrarily
    * large inputs from turning every pass into tens of thousands of
    * tasks). */
  def measuredWidth(
      spark: SparkSession, rows: Long, rowsPerTask: Long = 500000L): Int =
    math.max(
      spark.sessionState.conf.numShufflePartitions,
      math.min(4096L, (rows + rowsPerTask - 1) / rowsPerTask).toInt)

  /** A bucketed state table and its cleanup. `drop()` only when every
    * consumer is finished — eagerly for superseded round state (the
    * [[Pin.unpin]] discipline, applied to catalog entries: without it a
    * long session accumulates one catalog registration + parquet tree
    * per invocation). */
  final case class Tabled(df: DataFrame, table: String, path: String) {
    def drop(): Unit = {
      df.sparkSession.sql(s"DROP TABLE IF EXISTS ${Bucketing.quoted(table)}")
      TempWork.delete(path)
    }
  }

  /** Materialize `df` as a hash-bucketed, bucket-sorted parquet table on
    * `keys`, bucket count sized from the measured `rows`. The
    * pre-repartition on the bucket keys at the bucket count aligns
    * writer tasks with buckets (one file per bucket, not one per
    * task×bucket). */
  def bucketed(
      df: DataFrame, keys: Seq[String], rows: Long, prefix: String,
      rowsPerTask: Long = 500000L): Tabled =
    bucketedAtWidth(
      df, keys, measuredWidth(df.sparkSession, rows, rowsPerTask), prefix)

  /** [[bucketed]] at a caller-measured bucket count. */
  def bucketedAtWidth(
      df: DataFrame, keys: Seq[String], width: Int,
      prefix: String): Tabled = {
    val spark = df.sparkSession
    val path = TempWork.dir(s"graft-$prefix")
    val tbl = tableName(spark, prefix)
    ScopedConf.withShufflePartitions(spark, width) {
      Bucketing.writeBucketed(
        df.repartition(width, keys.map(col): _*),
        s"$path/t", tbl, width, keys)
    }
    Tabled(Bucketing.read(spark, tbl), tbl, path)
  }

  /** Land `df` as plain parquet under a fresh [[TempWork]] dir and
    * return the schema'd scan (schema'd: a file-less dir — an empty
    * frontier step, a candidate-free batch — must read back as an empty
    * frame, not error; the PairState empty-segment lesson). */
  def stage(df: DataFrame, prefix: String): DataFrame =
    stageAt(df, s"${TempWork.dir(s"graft-$prefix")}/s")

  /** A placed state frame, its release, and its MEASURED row count
    * (exact — from the placement's own staging footers or pinned-block
    * count; callers that need the cardinality for width formulas must
    * read it from here instead of launching another count job; −1 when
    * the constructor did not measure, e.g. an operator wrapping its own
    * round state). `release()` only when every consumer is finished:
    * it unpins the pinned form or deletes the staged tree — either way
    * the blocks/files are gone, so a released frame must never be
    * scanned again. */
  final case class Placed(
      df: DataFrame, release: () => Unit, rows: Long = -1L)

  /** The size-gated placement primitive, ONE plan execution total:
    * land `df` to a parquet stage, read the row count from the parquet
    * FOOTERS (driver-side metadata, zero jobs — [[ParquetFooters]]),
    * then place — below `gateRows`, re-pin from the stage at the
    * measured width on `keys` and delete the stage (executor storage,
    * fastest re-reads — the [[Pin.atWidth]] contract without its
    * second count); at or above, keep the staged scan (local disk;
    * executor storage holds nothing).
    *
    * Why stage-first instead of count-then-decide: the count would
    * execute `df`'s plan once EXTRA (for a pair-join-derived edge set,
    * that doubles the dominant upstream join); staging executes it
    * exactly once and the placement decision reads only footers. The
    * stage write runs under a generous fixed over-width (the
    * Pin.atWidth first-pin rationale: bounds per-task frames on
    * arbitrarily large inputs; AQE re-fuses small volumes back down,
    * which is safe here because the stage is never pinned).
    *
    * `upperBoundRows` ≥ 0 short-circuits the stage round-trip when a
    * caller can PROVE the frame small from metadata it already holds
    * (an input scan's footer rows bounding a join's output, a
    * pre-distinct parent count): below the gate by proof, the frame
    * pins directly at the bound's measured width — one exchange, one
    * pin, no disk round-trip (VERDICT r13: the stage write+read is the
    * placement's whole cost on a sync-slow volume, and it buys nothing
    * when the answer is known to be "pin"). The bound must be SOUND —
    * an under-estimate would block-pin a corpus-sized frame, the exact
    * 4 GiB-tier OOM class the gate exists for — so callers pass it
    * only when it is a true upper bound. At or above the gate the
    * bound is ignored and the staging path runs unchanged. */
  def pinOrStage(
      df: DataFrame, keys: Seq[org.apache.spark.sql.Column],
      prefix: String, gateRows: Long = DefaultGateRows,
      rowsPerTask: Long = 500000L, upperBoundRows: Long = -1L): Placed = {
    val spark = df.sparkSession
    if (upperBoundRows >= 0 && upperBoundRows < gateRows) {
      // width from the bound: true rows ≤ bound < gate, so per-task
      // frames stay bounded; below the gate the measured width is the
      // session width anyway (gate/rowsPerTask ≈ session cores), so a
      // loose-but-sound bound cannot over- or under-width the pin
      val width = measuredWidth(spark, upperBoundRows, rowsPerTask)
      val p = Pin(
        if (keys.isEmpty) df.repartition(width)
        else df.repartition(width, keys: _*))
      val n = p.count() // cached-block scan — the plan ran once, in Pin
      return Placed(p, () => Pin.unpin(p), n)
    }
    val dir = TempWork.dir(s"graft-$prefix")
    val first = math.max(
      spark.sessionState.conf.numShufflePartitions * 16, 256)
    val scan = ScopedConf.withShufflePartitions(spark, first) {
      stageAt(df, s"$dir/s")
    }
    // driver-side footer count only while the stage is few-file (AQE
    // coalesces small volumes; a corpus-sized stage can be hundreds of
    // files, where a distributed count is faster — ParquetFooters
    // scaladoc)
    val metaN = ParquetFooters.rowsIfFew(spark, Seq(s"$dir/s"), 64)
    val n = if (metaN >= 0) metaN else scan.count()
    if (n < gateRows) {
      val width = measuredWidth(spark, n, rowsPerTask)
      val p = Pin(
        if (keys.isEmpty) scan.repartition(width)
        else scan.repartition(width, keys: _*))
      // the pin is eager and lineage-truncated — the stage has no reader
      TempWork.delete(dir)
      Placed(p, () => Pin.unpin(p), n)
    } else Placed(scan, () => TempWork.delete(dir), n)
  }

  /** [[stage]] at a caller-managed path — for per-round/per-hop dirs
    * whose lifecycle the operator owns (write hop t, delete hop t−1). */
  def stageAt(df: DataFrame, path: String): DataFrame = {
    df.write.option("parquet.block.size", 16L * 1024 * 1024).parquet(path)
    df.sparkSession.read.schema(df.schema).parquet(path)
  }
}
