package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multi-source breadth-first search — exact hop distance from a seed
  * set over an undirected edge list, the traversal primitive the graph
  * family lacked beside [[Triangles]] (density), [[KCore]] (peeling),
  * [[MassRank]] (propagation), and label-propagation communities:
  * "how far is every catalog node from a trusted seed set" drives
  * seed-distance features, spam-distance filters, and neighborhood
  * truncation before more expensive per-pair work.
  *
  * Semantics: `dist(v)` = minimum number of edges from any seed to
  * `v`, for every `v` within `maxHops`; seeds themselves are distance
  * 0 (seeds not present in the edge list are still reported at 0 —
  * a seed is a fact, not a lookup). Nodes farther than `maxHops` are
  * ABSENT, which is the documented contract (bounded-radius search),
  * not an under-provisioned approximation — and when the frontier
  * empties before `maxHops`, iteration stops early at the true
  * fixpoint (every reachable node is in hand), so over-provisioning
  * `maxHops` costs only the rounds actually needed. The bounded-round
  * + early-stop discipline is [[KCore]]'s; here an exhausted bound is
  * legal output rather than an error because the radius IS the
  * contract.
  *
  * Scale shape (100 TB of edges): per hop ONE shuffle join of the
  * CURRENT FRONTIER (not the visited set, not the corpus) against the
  * edge list, one distinct, one anti-join against the visited frame —
  * frontier-proportional work, the textbook distributed BFS. The edge
  * list pins once; visited/frontier pin per round so lineage stays
  * flat. No driver-side adjacency ever materializes.
  */
object Bfs {

  /** `(node, dist)` for every node within `maxHops` of `seeds`.
    *
    * Per-hop shuffle width is sized from the measured input edge count
    * and the adjacency is hash-partitioned + sorted once before the
    * pin (the [[LabelPropagation]]/[[TemporalBfs]] discipline — the
    * 100× probe OOM'd the fixed session width on the frontier⋈edges
    * hop exactly as q272 did).
    *
    * @param edges   edge list; direction is ignored (undirected walk),
    *                self-loops are harmless
    * @param seeds   one-column frame of seed nodes (deduplicated here)
    * @param maxHops search radius, in [0, 64]
    */
  def distances(
      edges: DataFrame, srcCol: String, dstCol: String,
      seeds: DataFrame, maxHops: Int,
      rowsPerTask: Long = 500000L,
      tableStateRows: Long = graft.core.StateTable.DefaultGateRows)
      : DataFrame = {
    require(maxHops >= 0 && maxHops <= 64,
      s"maxHops must be in [0,64], got $maxHops")
    require(rowsPerTask >= 1, s"rowsPerTask must be >= 1, got $rowsPerTask")
    val spark = edges.sparkSession
    val e0 = edges.select(col(srcCol).as("a"), col(dstCol).as("b"))
    // upper bound on the directed-edge count — over-estimating only
    // widens the exchange, which AQE coalesces. The SAME count gates
    // adjacency/frontier placement (the StateTable pin class): below
    // the gate everything block-pins as before; at or above, the
    // adjacency becomes an `a`-bucketed parquet table (each hop join
    // still gets an exchange-free, sort-free scan side) and each
    // frontier streams through its own parquet dir — executor storage
    // holds nothing corpus-sized. Over-estimation tables early: slower,
    // never wrong (the regimes are spec-pinned output-identical).
    val n2 = 2L * e0.count()
    val width = math.max(
      spark.sessionState.conf.numShufflePartitions,
      ((n2 + rowsPerTask - 1) / rowsPerTask).toInt)
    if (n2 >= tableStateRows)
      return distancesTabled(spark, e0, seeds, maxHops, width)
    val e = graft.core.ScopedConf.withShufflePartitions(spark, width) {
      e0.unionByName(e0.select(col("b").as("a"), col("a").as("b")))
        .distinct()
        .repartition(width, col("a"))
        .sortWithinPartitions(col("a"))
        .transform(graft.core.Pin.apply)
    }
    var visited = seeds.toDF("node").distinct()
      .withColumn("dist", lit(0L))
      .transform(graft.core.Pin.apply) // consumed by join + union each hop
    var frontier = visited.select(col("node"))
    var hop = 0L
    var done = frontier.isEmpty
    while (hop < maxHops && !done) {
      hop += 1L
      val next = graft.core.ScopedConf.withShufflePartitions(spark, width) {
        frontier.join(e, col("node") === col("a"))
          .select(col("b").as("node")).distinct()
          .join(visited.select(col("node")), Seq("node"), "left_anti")
          .transform(graft.core.Pin.apply)
      }
      val nv = visited
        .unionByName(next.withColumn("dist", lit(hop)))
        .transform(graft.core.Pin.apply)
      // nv and next are materialized with truncated lineage — the
      // superseded visited pin and the PREVIOUS hop's frontier pin
      // (its rows live in nv) release NOW instead of accumulating one
      // frontier copy per hop (the KCore round discipline; unpin is a
      // no-op on hop 1's derived frontier)
      graft.core.Pin.unpin(visited)
      graft.core.Pin.unpin(frontier)
      visited = nv
      frontier = next
      done = next.isEmpty
    }
    visited
  }

  /** The ≥`tableStateRows` regime of [[distances]]: the adjacency as an
    * `a`-bucketed parquet table (exchange-free, sort-free hop-join scan
    * side — the [[RandomWalks]] tabled-walk layout), each hop's
    * `(node, dist)` frontier as its own parquet dir, the visited set as
    * the lazy union of the landed hops. Output-identical to the pinned
    * form (BfsSpec pins the regimes against each other); executor
    * storage holds nothing. State lives under [[graft.core.TempWork]]
    * (its local-mode-stand-in caveat applies on a real cluster). */
  private def distancesTabled(
      spark: org.apache.spark.sql.SparkSession, e0: DataFrame,
      seeds: DataFrame, maxHops: Int, width: Int): DataFrame = {
    val adj = graft.core.ScopedConf.withShufflePartitions(spark, width) {
      graft.core.StateTable.bucketedAtWidth(
        e0.unionByName(e0.select(col("b").as("a"), col("a").as("b")))
          .distinct(),
        Seq("a"), width, "bfs_adj")
    }
    val work = graft.core.TempWork.dir("graft-bfs")
    val hop0 = graft.core.StateTable.stageAt(
      seeds.toDF("node").distinct().withColumn("dist", lit(0L)),
      s"$work/h0")
    var hops = List(hop0)
    var frontier = hop0.select(col("node"))
    var hop = 0L
    var done = frontier.isEmpty
    while (hop < maxHops && !done) {
      hop += 1L
      val visited = hops.map(_.select(col("node")))
        .reduce(_ unionByName _)
      val next = graft.core.ScopedConf.withShufflePartitions(spark, width) {
        graft.core.StateTable.stageAt(
          frontier.join(adj.df, col("node") === col("a"))
            .select(col("b").as("node")).distinct()
            .join(visited, Seq("node"), "left_anti")
            .withColumn("dist", lit(hop)),
          s"$work/h$hop")
      }
      hops = next :: hops
      frontier = next.select(col("node"))
      done = next.isEmpty
    }
    // every hop has landed and the returned frame reads only the hop
    // dirs — drop the adjacency table (catalog + corpus-sized files) NOW
    adj.drop()
    hops.reverse.reduce(_ unionByName _)
  }
}
