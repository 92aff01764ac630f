package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental steady-state prober: runMain graft.ProbeDelta <sfDir>
  * [cooccur|join]... — measures the DELTA PATH ALONE for the
  * incremental-view operators, the number a production consumer cares
  * about (cost per increment), which the registered queries q230/q271
  * deliberately do NOT time in isolation (their bench rows carry the
  * full-recompute equivalence oracle + state build).
  *
  * Protocol: state is pre-built and PERSISTED untimed (parquet, 16 MB
  * row groups — the state-table discipline), exactly as a nightly job
  * would find it; then ONE steady-state batch (~1% of the corpus)
  * is applied and only that application is timed, through a noop
  * materialization. The MinHash family's equivalent is
  * [[ProbeIncrementalDedup]] (fixed 100-doc batch vs growing corpus).
  */
object ProbeDelta {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val which = if (args.length > 1) args.drop(1).toSet
      else Set("cooccur", "join", "lsm")
    // "lsmlocal" is opt-in: the PARTIAL-rewrite adjudication point
    // (compact cost ∝ touched pk share), complementing lsm's
    // all-bucket spray
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // SPARK_GRAFT_MASTER / SPARK_GRAFT_WIDTH: same contract as Bench /
    // ProbeOne — width is a DATA-volume knob, decoupled from cores, so
    // the LSM probe (PairState, exactly the path whose width-vs-cores
    // coupling round 11 identified as the giant-block OOM cause) can
    // run the local-cluster tier at data-sized width
    val master = sys.env.getOrElse("SPARK_GRAFT_MASTER", s"local[$cpus]")
    val width = sys.env.getOrElse("SPARK_GRAFT_WIDTH", cpus)
    val spark = SparkSession.builder().master(master)
      .config("spark.sql.shuffle.partitions", width)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timedNoop(df: DataFrame): Double = {
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }

    val plays = graft.core.Tables.lineitem(spark, dir)
      .join(graft.core.Tables.orders(spark, dir),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey").as("user_id"),
        col("l_partkey").as("recording_mbid"))

    if (which("cooccur")) {
      // state: co-presence + pair counts over the first 99% of the
      // item space; batch: the top 1% of items (users straddle — the
      // hard replay case, as in q230)
      val cut = (plays.agg(max(col("recording_mbid"))).head().getLong(0)
        + 1L) * 99L / 100L
      val base = plays.filter(col("recording_mbid") < cut)
      val batch = plays.filter(col("recording_mbid") >= cut)
      val work = graft.core.TempWork.dir("graft-probedelta")
      val basePres = base
        .select(col("recording_mbid").as("item"), col("user_id").as("user"))
        .distinct().transform(graft.core.Pin.apply)
      val basePairs = graft.similarity.ChunkedPairs.dots(
          basePres.select(col("item"), col("user"), lit(1L).as("c")),
          "item", "user", "c")
        .select(col("u1").as("item_a"), col("u2").as("item_b"),
          col("dot").as("users_both"))
      basePres.write.option("parquet.block.size", 16L * 1024 * 1024)
        .parquet(s"$work/presence")
      basePairs.write.option("parquet.block.size", 16L * 1024 * 1024)
        .parquet(s"$work/pairs")
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      val nState = spark.read.parquet(s"$work/pairs").count()
      val nBatch = batch.count()
      val t = timedNoop {
        val (pairs, presence) = graft.similarity.Cooccurrence.updateCounts(
          spark.read.parquet(s"$work/pairs"),
          spark.read.parquet(s"$work/presence"),
          batch, "user_id", "recording_mbid")
        pairs.unionByName(
          presence.select(col("item").as("item_a"),
            col("user").as("item_b"), lit(0L).as("users_both")))
      }
      println(f"cooccur-delta $dir: statePairs=$nState batchRows=$nBatch " +
        f"delta=$t%.2f s")
    }

    if (which("lsm")) {
      // the PairState production layout: same 99/1 split as `cooccur`,
      // state built and landed UNTIMED (pk-partitioned base), then the
      // timed legs a nightly consumer pays — (a) ONE batch application
      // (delta + segment write; the base is never shuffled) and (b) the
      // amortized compaction fold, reported separately because a real
      // stream pays it once per ~(compactFraction × base/batch) batches.
      // SPARK_GRAFT_LSM_BATCH_FRACTION overrides the 1% batch window —
      // the cross-tier batch-boundedness comparison needs the SAME
      // ABSOLUTE batch at every tier (1% of a 100× corpus is a 3.3×
      // bigger batch than 1% of a 30× one), so the 100× run is probed
      // at 0.003 as well as the default
      val frac = sys.env.getOrElse("SPARK_GRAFT_LSM_BATCH_FRACTION",
        "0.01").toDouble
      val span = plays.agg(max(col("recording_mbid"))).head()
        .getLong(0) + 1L
      val cut = (span * (1.0 - frac)).toLong
      val base = plays.filter(col("recording_mbid") < cut)
      val batch = plays.filter(col("recording_mbid") >= cut)
      val work = graft.core.TempWork.dir("graft-probelsm")
      Console.err.println("[lsm] create start")
      val st = graft.similarity.PairState.create(
        spark, s"$work/state", base, "user_id", "recording_mbid",
        buckets = 64)
      Console.err.println("[lsm] create done")
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      val nState = st.baseRows
      val nBatch = batch.count()
      val t0 = System.nanoTime()
      Console.err.println("[lsm] apply start")
      val nSeg = st.applyBatch(batch, "user_id", "recording_mbid",
        compactFraction = 1e12)
      val tApply = (System.nanoTime() - t0) / 1e9
      Console.err.println("[lsm] apply done; compact start")
      val t1 = System.nanoTime()
      st.compact()
      val tCompact = (System.nanoTime() - t1) / 1e9
      println(f"cooccur-lsm $dir: statePairs=$nState batchRows=$nBatch " +
        f"segRows=$nSeg apply=$tApply%.2f s compact=$tCompact%.2f s")
    }

    if (which("lsmlocal")) {
      // The PARTIAL-rewrite adjudication: pk = hash(item_a, item_b)
      // deliberately sprays any sizeable batch across every bucket, so
      // the key-local regime is the SMALL-delta one — a batch whose
      // pair delta is a handful of rows touches a strict subset of pk
      // partitions. State = full corpus; batch = ONE new item for the
      // lowest-degree user, so the delta is that user's co-item list
      // (the smallest organic non-empty delta the corpus offers).
      // Reported: touched partitions + compact seconds, to divide
      // against the `lsm` mode's all-bucket spray row.
      val span = plays.agg(max(col("recording_mbid"))).head()
        .getLong(0) + 1L
      val work = graft.core.TempWork.dir("graft-probelsmlocal")
      val st = graft.similarity.PairState.create(
        spark, s"$work/state", plays, "user_id", "recording_mbid",
        buckets = 64)
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      val loner = plays.groupBy(col("user_id"))
        .agg(countDistinct(col("recording_mbid")).as("d"))
        .orderBy(col("d"), col("user_id")).head()
      import spark.implicits._
      val batch = Seq((loner.getLong(0), span))
        .toDF("user_id", "recording_mbid")
      val nSeg = st.applyBatch(batch, "user_id", "recording_mbid",
        compactFraction = 1e12)
      val touched = spark.read
        .parquet(s"$work/state/seg/s0")
        .select(col("pk")).distinct().count()
      val t0 = System.nanoTime()
      st.compact()
      val tCompact = (System.nanoTime() - t0) / 1e9
      println(f"cooccur-lsmlocal $dir: userDegree=${loner.getLong(1)} " +
        f"segRows=$nSeg touchedPk=$touched/64 compact=$tCompact%.2f s")
    }

    if (which("join")) {
      // q271's view shape; delta = last ~1% of ship dates on R, 1% of
      // order keys on S — history NEVER re-joins history
      val li = graft.core.Tables.lineitem(spark, dir).select(
        col("l_orderkey").as("okey"),
        col("l_returnflag").as("rf"), col("l_linestatus").as("ls"),
        expr("cast(round(l_extendedprice * (1 - l_discount) * 100) " +
          "as bigint)").as("rev"),
        col("l_shipdate"))
      val o = graft.core.Tables.orders(spark, dir).select(
        col("o_orderkey").as("okey"), col("o_orderpriority").as("prio"))
      val (liOld, liNew) = (li.filter(col("l_shipdate") < "1998-11-01"),
        li.filter(col("l_shipdate") >= "1998-11-01"))
      val (oOld, oNew) = (o.filter(col("okey") % 100L =!= 0L),
        o.filter(col("okey") % 100L === 0L))
      def slim(df: DataFrame) = df.drop("l_shipdate")
      val nR = liNew.count(); val nS = oNew.count()
      val t = timedNoop {
        graft.operators.IncrementalJoin.deltaInner(
            slim(liOld), slim(liNew), oOld, oNew, Seq("okey"))
          .groupBy(col("rf"), col("ls"), col("prio"))
          .agg(sum(col("rev")).as("revenue_cents"),
            count(lit(1)).as("n_items"))
      }
      println(f"join-delta $dir: dR=$nR dS=$nS delta=$t%.2f s")
    }
    spark.stop()
  }
}
