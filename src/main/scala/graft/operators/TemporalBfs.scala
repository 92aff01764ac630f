package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Time-respecting earliest-arrival search — [[Bfs]] for TEMPORAL
  * graphs, where each edge carries a timestamp and a path may only
  * use edges at or after its current arrival time (information,
  * contagion, or money can flow forward in time only). Static
  * reachability OVERSTATES temporal reachability — an edge that
  * happened before you arrived is no path at all — which is exactly
  * why fraud-flow, influence, and provenance questions need this
  * operator and not q252's static hops.
  *
  * Semantics: `arrival(v)` = the minimum, over time-respecting paths
  * of ≤ maxHops edges from any seed, of the LAST edge's timestamp
  * (seeds start at their own `t0`). The iteration is label-correcting
  * — an improved (earlier) arrival unlocks earlier outgoing edges, so
  * improved nodes re-propagate — and monotone (arrivals only
  * decrease), so the delta iteration below equals full per-round
  * propagation and the whole run is exact integer algebra any engine
  * replays (the oracle unrolls the same min-merge rounds).
  *
  * Scale shape (100 TB of timestamped edges): per round ONE shuffle
  * join of the IMPROVED frontier against the edge list + a
  * min-aggregate + a full-outer min-merge against the best-known
  * frame — frontier-proportional, the [[Bfs]] discipline with a
  * time-filtered join condition; early stop at the fixpoint.
  */
object TemporalBfs {

  /** `(node, arrival)` for every node temporally reachable within
    * `maxHops` edges; direction is ignored (undirected flow).
    *
    * Per-round shuffle width is sized from the measured input edge
    * count (the [[LabelPropagation]] discipline): the 100× probe
    * showed the session width is the per-task memory cliff here — at
    * width 32 each task of the frontier⋈edges round held a multi-
    * million-row slice of the 100M-row directed adjacency (plus the
    * pinned block it re-reads) and OOM'd an 8 GiB heap. The adjacency
    * is hash-partitioned on the join key and sorted ONCE before the
    * pin, so every round's join reads it exchange-free and sort-free;
    * only the node-count-sized frontier/best frames shuffle per round.
    *
    * @param ts    integer edge timestamp column (days/micros — any
    *              consistent unit)
    * @param seeds `(node, t0)` frame: each seed is live from its t0
    */
  def earliestArrival(
      edges: DataFrame, srcCol: String, dstCol: String, ts: String,
      seeds: DataFrame, maxHops: Int,
      rowsPerTask: Long = 500000L,
      tableStateRows: Long = graft.core.StateTable.DefaultGateRows)
      : DataFrame = {
    require(maxHops >= 0 && maxHops <= 64,
      s"maxHops must be in [0,64], got $maxHops")
    require(rowsPerTask >= 1, s"rowsPerTask must be >= 1, got $rowsPerTask")
    val spark = edges.sparkSession
    val e0 = edges.select(col(srcCol).as("a"), col(dstCol).as("b"),
      col(ts).cast("long").as("ets"))
    // upper bound on the directed-edge count (2 × input rows; the
    // distinct can only shrink it) — one upstream pass, and an
    // over-estimate only widens the exchange, which AQE coalesces. The
    // SAME count gates state placement (the StateTable pin class — a
    // corpus-sized temporal edge pin is the same cluster-storage budget
    // as the static families'); over-estimation tables early: slower,
    // never wrong (the regimes are spec-pinned output-identical).
    val n2 = 2L * e0.count()
    val width = math.max(
      spark.sessionState.conf.numShufflePartitions,
      ((n2 + rowsPerTask - 1) / rowsPerTask).toInt)
    val seeds0 = seeds.toDF("node", "arrival")
      .groupBy(col("node")).agg(min(col("arrival").cast("long"))
        .as("arrival"))
    if (n2 >= tableStateRows)
      return earliestArrivalTabled(spark, e0, seeds0, maxHops, width)
    val e = graft.core.ScopedConf.withShufflePartitions(spark, width) {
      e0.unionByName(
          e0.select(col("b").as("a"), col("a").as("b"), col("ets")))
        .distinct()
        .repartition(width, col("a"))
        .sortWithinPartitions(col("a"))
        .transform(graft.core.Pin.apply)
    }
    var best = seeds0.transform(graft.core.Pin.apply)
    var prevPin = best
    var frontier = best
    var hop = 0
    var done = frontier.isEmpty
    while (hop < maxHops && !done) {
      hop += 1
      val merged = graft.core.ScopedConf.withShufflePartitions(spark, width) {
        round(e, frontier, best).transform(graft.core.Pin.apply)
      }
      // merged is materialized with truncated lineage; frontier and
      // best are projections of the PREVIOUS round's pin — release it
      // NOW (the KCore round discipline) instead of accumulating one
      // node-sized copy per hop
      graft.core.Pin.unpin(prevPin)
      prevPin = merged
      frontier = merged.filter(col("improved"))
        .select(col("node"), col("arrival"))
      best = merged.select(col("node"), col("arrival"))
      done = frontier.isEmpty
    }
    best
  }

  /** One label-correcting round: earliest candidate arrivals from the
    * improved frontier, min-merged into the best-known frame; `improved`
    * marks nodes whose arrival got earlier (the next frontier). */
  private def round(
      e: DataFrame, frontier: DataFrame, best: DataFrame): DataFrame = {
    val cand = frontier.join(e,
        col("node") === col("a") && col("ets") >= col("arrival"))
      .groupBy(col("b").as("cnode"))
      .agg(min(col("ets")).as("cand"))
    best
      .join(cand, col("node") === col("cnode"), "full_outer")
      .select(
        coalesce(col("node"), col("cnode")).as("node"),
        least(col("arrival"), col("cand")).as("arrival"),
        (col("arrival").isNull ||
          (col("cand").isNotNull && col("cand") < col("arrival")))
          .as("improved"))
  }

  /** The ≥`tableStateRows` regime of [[earliestArrival]]: the temporal
    * adjacency as an `a`-bucketed, bucket-sorted parquet table
    * (exchange-free, sort-free round-join scan side), each round's
    * merged `(node, arrival, improved)` frame in its own parquet dir
    * with the superseded round deleted as soon as the new one lands —
    * the [[Bfs]]/[[LabelPropagation]] tabled layout; executor storage
    * holds nothing. Output-identical to the pinned form (TemporalBfsSpec
    * pins the regimes against each other); state lives under
    * [[graft.core.TempWork]] (its local-mode-stand-in caveat applies on
    * a real cluster). */
  private def earliestArrivalTabled(
      spark: org.apache.spark.sql.SparkSession, e0: DataFrame,
      seeds0: DataFrame, maxHops: Int, width: Int): DataFrame = {
    val adj = graft.core.ScopedConf.withShufflePartitions(spark, width) {
      graft.core.StateTable.bucketedAtWidth(
        e0.unionByName(
            e0.select(col("b").as("a"), col("a").as("b"), col("ets")))
          .distinct(),
        Seq("a"), width, "tbfs_adj")
    }
    val work = graft.core.TempWork.dir("graft-tbfs")
    var merged = graft.core.StateTable.stageAt(
      seeds0.withColumn("improved", lit(true)), s"$work/m0")
    var hop = 0
    var done = merged.filter(col("improved")).isEmpty
    while (hop < maxHops && !done) {
      hop += 1
      val frontier = merged.filter(col("improved"))
        .select(col("node"), col("arrival"))
      val best = merged.select(col("node"), col("arrival"))
      val next = graft.core.ScopedConf.withShufflePartitions(spark, width) {
        graft.core.StateTable.stageAt(
          round(adj.df, frontier, best), s"$work/m$hop")
      }
      // round `hop` has landed — the superseded round's dir has no reader
      graft.core.TempWork.delete(s"$work/m${hop - 1}")
      merged = next
      done = merged.filter(col("improved")).isEmpty
    }
    // the returned frame reads only the final round's dir — drop the
    // adjacency table (catalog + corpus-sized files) NOW
    adj.drop()
    merged.select(col("node"), col("arrival"))
  }
}
