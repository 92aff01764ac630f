package graft.similarity

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Bucket-partitioned, segment-logged co-occurrence pair state — the
  * storage layout that makes [[Cooccurrence]]'s incremental maintenance
  * BATCH-bounded instead of state-bounded.
  *
  * [[Cooccurrence.updateCounts]] is exact but its merge re-aggregates
  * the FULL prior pair state per increment (one exchange over every
  * stored pair): measured 38 s at 30× → 235 s at 100× for the SAME
  * batch shape, tracking the 375M→1.26B prior-pair rows (SCALE.md
  * round 10) — at the reference's 27B-listen MLHD scale that turns a
  * nightly job into a rebuild. This class is the production layout
  * (the partial-aggregate reuse contract of the reference's
  * incremental engine, incremental_stats_engine.py:86-142, applied to
  * the pair table):
  *
  *   - `base/` — the merged pair counts, parquet DIRECTORY-PARTITIONED
  *     by `pk = pmod(xxhash64(item_a, item_b), buckets)` with bounded
  *     16 MB row groups (the state-table discipline).
  *   - `seg/<n>/` — one pk-partitioned DELTA segment per applied
  *     batch: exactly the pair-count increments that batch created,
  *     O(batch × affected-user degree) rows, written without ever
  *     shuffling the base.
  *   - reads ([[pairs]]) merge base ∪ segments with one aggregate —
  *     segment volume is threshold-bounded, so the read-side merge
  *     overhead is a bounded fraction of the base scan.
  *   - [[compact]] folds segments into the base REWRITING ONLY TOUCHED
  *     pk PARTITIONS (Spark dynamic partition overwrite): a key-local
  *     batch stream rewrites only its key range; a spraying batch
  *     stream still pays the full fold, but only once the accumulated
  *     segment volume crosses `compactFraction` of the base — i.e. the
  *     fold cost is AMORTIZED over ~(compactFraction × base/batch)
  *     increments, so the per-increment cost is O(batch) either way.
  *
  * The presence table (`presence/`, distinct (item, user)) is appended
  * per batch; the batch's new-row anti-join and the d1 user join scan
  * it once per increment — presence is ~√(pairs) in practice (55M rows
  * where pairs are 1.26B at the 100× probe), so those scans are not
  * the scaling term the pair merge was.
  *
  * Everything here is exact bigint arithmetic; feeding
  * ([[pairs]], [[presence]]) to [[Cooccurrence.scoreCounts]] equals a
  * full [[Cooccurrence.pmi]] recompute bit-for-bit (q230's oracle
  * states exactly that, across two batches and a forced compaction).
  */
final class PairState private (
    spark: SparkSession, path: String, val buckets: Int) {
  import PairState._

  private def fs = org.apache.hadoop.fs.FileSystem.get(
    new java.net.URI(path), spark.sparkContext.hadoopConfiguration)
  private def hp(s: String) = new org.apache.hadoop.fs.Path(s)

  private def pkOf = pmod(xxhash64(col("item_a"), col("item_b")),
    lit(buckets.toLong))

  private def segDirs(): Seq[String] = {
    val seg = hp(s"$path/seg")
    if (!fs.exists(seg)) Seq.empty
    else fs.listStatus(seg).filter(_.isDirectory)
      .map(_.getPath.toString).sorted.toSeq
  }

  /** Merged pair counts `(item_a, item_b, users_both)`. With no
    * outstanding segments this is the base scan itself (no aggregate);
    * with segments it is base ∪ segments through one key-partitioned
    * sum — segment volume is bounded by the compaction threshold. */
  def pairs(): DataFrame = {
    val base = spark.read.parquet(s"$path/base").drop("pk")
    val segs = segDirs()
    if (segs.isEmpty) base
    else base.unionByName(
        spark.read.parquet(segs: _*).drop("pk"))
      .groupBy(col("item_a"), col("item_b"))
      .agg(sum(col("users_both")).as("users_both"))
  }

  /** The distinct (item, user) presence set backing the counts. */
  def presence(): DataFrame = spark.read.parquet(s"$path/presence")

  /** Row count of the compacted base (from the metadata file — no
    * scan). Excludes outstanding segment rows. */
  def baseRows: Long = readMeta().baseRows

  /** Apply one listen batch: compute the exact pair delta (the
    * [[Cooccurrence.updateCounts]] d1 ∪ d2 derivation — idempotent
    * under replayed (item, user) rows), land it as one pk-partitioned
    * segment, append the new presence rows, and fold segments into the
    * base only when their accumulated volume crosses `compactFraction`
    * of the base. Per-increment cost: O(batch × affected-user degree)
    * for the delta + an O(presence) scan for the anti-join/d1 — the
    * base pair state is NEVER shuffled on the non-compacting path.
    * Returns the segment's row count. */
  def applyBatch(
      batch: DataFrame, userCol: String, itemCol: String,
      compactFraction: Double = 0.25): Long = {
    require(compactFraction > 0, "compactFraction must be > 0")
    val bp = batch
      .select(col(itemCol).as("item"), col(userCol).as("user")).distinct()
    val pres = presence()
    val newPres = bp.join(pres, Seq("item", "user"), "left_anti")
      .transform(graft.core.Pin.apply)
    // (n.item, user) is new and (o.item, user) is prior state, so the
    // two items can never coincide — no self-pair filter needed
    val d1 = newPres.alias("n")
      .join(pres.alias("o"), col("n.user") === col("o.user"))
      .select(least(col("n.item"), col("o.item")).as("item_a"),
        greatest(col("n.item"), col("o.item")).as("item_b"))
    val d2 = newPres.alias("x")
      .join(newPres.alias("y"),
        col("x.user") === col("y.user") && col("x.item") < col("y.item"))
      .select(col("x.item").as("item_a"), col("y.item").as("item_b"))
    val delta = d1.unionByName(d2)
      .groupBy(col("item_a"), col("item_b"))
      .agg(count(lit(1)).cast("long").as("users_both"))
      .withColumn("pk", pkOf)
    // The delta is NOT pinned: its one expensive consumer is the
    // segment write, and the row count comes from the landed parquet's
    // footers afterwards. A session-width pin here is the giant-block
    // re-read hazard Pin.atWidth documents — at 30× the pinned delta's
    // 32 ~195 MB blocks OOMed the segment write's sort when
    // BlockManager re-cached them as whole ByteBuffers concurrently.
    val segPath = s"$path/seg/s${segDirs().size}"
    delta.write.option("parquet.block.size", RowGroupBytes)
      .partitionBy("pk").parquet(segPath)
    // explicit schema: a no-pair batch lands only a _SUCCESS marker,
    // which schema inference rejects
    val nSeg = spark.read.schema(delta.schema).parquet(segPath).count()
    // a fully-replayed batch creates no pairs — drop the segment (an
    // empty partitioned write leaves a file-less dir that poisons
    // later multi-dir reads)
    if (nSeg == 0) fs.delete(hp(segPath), true)
    // presence rows appended only AFTER every delta job has run (the
    // pinned delta above was the last action reading the old scan)
    newPres.write.mode("append")
      .option("parquet.block.size", RowGroupBytes)
      .parquet(s"$path/presence")
    graft.core.Pin.unpin(newPres)
    val m = readMeta()
    val segRows = m.segRows + nSeg
    writeMeta(m.copy(segRows = segRows))
    if (segRows > compactFraction * math.max(1L, m.baseRows)) compact()
    nSeg
  }

  /** Fold all outstanding segments into the base, rewriting ONLY the
    * pk partitions the segments touch (dynamic partition overwrite —
    * untouched base partitions are never read, shuffled, or
    * rewritten), then drop the segment log. No-op with no segments. */
  def compact(): Unit = {
    val segs = segDirs()
    if (segs.isEmpty) return
    // round-robin atWidth: the segment read's scan partitions are
    // 128 MB of FILE bytes, 3×+ that as pinned serialized rows — the
    // giant-block hazard for a near-threshold segment log. Keys stay
    // empty: hashing on pk alone would fold the pin into ≤buckets
    // non-empty blocks.
    val segDf = graft.core.Pin.atWidth(
      spark.read.parquet(segs: _*), Seq.empty)
    val touched = segDf.select(col("pk")).distinct()
      .collect().map(_.getAs[Number](0).longValue()).sorted
    val m = readMeta()
    // width from the measured volume the fold actually carries: the
    // touched share of the base plus the segment rows. It rides an
    // EXPLICIT repartition on the group keys (the updateCounts
    // discipline): AQE coalesces a plain groupBy's shuffle back toward
    // the 64 MB advisory target no matter what shuffle.partitions
    // says, and a user-specified repartition is exempt.
    val carried =
      m.baseRows * touched.length / math.max(1, buckets) + m.segRows
    val width = math.max(
      spark.sessionState.conf.numShufflePartitions,
      math.min(4096L, carried / 2000000L).toInt)
    val basePath = s"$path/base"
    val touchedBase = spark.read.parquet(basePath)
      .filter(col("pk").isin(touched.map(Long.box): _*))
    // The fold STREAMS into a scratch dir — the base stays read-only
    // for the whole job, so nothing needs pinning (a pinned fold of a
    // 375M-row touched share is 20+ GB of Java-serialized blocks; this
    // exact site OOMed the 30× probe twice before landing here), and
    // the touched pk partition dirs are swapped in afterwards — the
    // same staging dynamic partition overwrite does internally, minus
    // the self-read conflict that forced the one-job form to pin.
    val tmp = s"$path/compact-tmp"
    fs.delete(hp(tmp), true)
    touchedBase.unionByName(segDf)
      .repartition(width, col("item_a"), col("item_b"), col("pk"))
      .groupBy(col("item_a"), col("item_b"), col("pk"))
      .agg(sum(col("users_both")).as("users_both"))
      .write.option("parquet.block.size", RowGroupBytes)
      .partitionBy("pk").parquet(tmp)
    graft.core.Pin.unpin(segDf)
    touched.foreach { k =>
      val src = hp(s"$tmp/pk=$k")
      val dst = hp(s"$basePath/pk=$k")
      // every touched pk has fold output (its segment rows are in the
      // fold input and counts never cancel); the guard just ensures a
      // base partition is never deleted without its replacement staged
      if (fs.exists(src)) { fs.delete(dst, true); fs.rename(src, dst) }
    }
    fs.delete(hp(tmp), true)
    segs.foreach(s => fs.delete(hp(s), true))
    writeMeta(Meta(buckets,
      baseRows = spark.read.parquet(basePath).count(), segRows = 0L))
  }

  private[similarity] def readMeta(): Meta = {
    val in = fs.open(hp(s"$path/meta"))
    val p = new java.util.Properties()
    try p.load(in) finally in.close()
    Meta(p.getProperty("buckets").toInt, p.getProperty("baseRows").toLong,
      p.getProperty("segRows").toLong)
  }

  private[similarity] def writeMeta(m: Meta): Unit = {
    val p = new java.util.Properties()
    p.setProperty("buckets", m.buckets.toString)
    p.setProperty("baseRows", m.baseRows.toString)
    p.setProperty("segRows", m.segRows.toString)
    val out = fs.create(hp(s"$path/meta"), true)
    try p.store(out, null) finally out.close()
  }
}

object PairState {
  private val RowGroupBytes = 16L * 1024 * 1024

  private[similarity] final case class Meta(
      buckets: Int, baseRows: Long, segRows: Long)

  /** Build a fresh state at `path` from a listen corpus: the presence
    * set, the full pair base via the out-of-core [[ChunkedPairs]]
    * stage, both landed with bounded row groups; the base
    * pk-partitioned for [[PairState.compact]]'s partial rewrites.
    * Requires a corpus with at least one co-occurring pair (a state
    * has to hold a base to partition). */
  def create(
      spark: SparkSession, path: String,
      events: DataFrame, userCol: String, itemCol: String,
      buckets: Int = 64,
      pairChunks: Int = ChunkedPairs.Auto): PairState = {
    require(buckets >= 1, s"buckets must be >= 1, got $buckets")
    val pres = events
      .select(col(itemCol).as("item"), col(userCol).as("user"))
      .distinct().transform(graft.core.Pin.apply)
    pres.write.option("parquet.block.size", RowGroupBytes)
      .parquet(s"$path/presence")
    val st = new PairState(spark, path, buckets)
    ChunkedPairs.dots(
        pres.select(col("item"), col("user"), lit(1L).as("c")),
        "item", "user", "c", pairChunks)
      .select(col("u1").as("item_a"), col("u2").as("item_b"),
        col("dot").as("users_both"))
      .withColumn("pk", st.pkOf)
      .write.option("parquet.block.size", RowGroupBytes)
      .partitionBy("pk").parquet(s"$path/base")
    graft.core.Pin.unpin(pres)
    val baseRows = spark.read.parquet(s"$path/base").count()
    require(baseRows > 0,
      "PairState.create needs a corpus with at least one co-present pair")
    st.writeMeta(Meta(buckets, baseRows, 0L))
    st
  }

  /** Open an existing state (created by [[create]]) at `path`. */
  def open(spark: SparkSession, path: String): PairState = {
    val probe = new PairState(spark, path, 1)
    new PairState(spark, path, probe.readMeta().buckets)
  }
}
