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
      rowsPerTask: Long = 500000L): DataFrame = {
    require(maxHops >= 0 && maxHops <= 64,
      s"maxHops must be in [0,64], got $maxHops")
    require(rowsPerTask >= 1, s"rowsPerTask must be >= 1, got $rowsPerTask")
    val spark = edges.sparkSession
    val e0 = edges.select(col(srcCol).as("a"), col(dstCol).as("b"))
    // upper bound on the directed-edge count — over-estimating only
    // widens the exchange, which AQE coalesces
    val width = math.max(
      spark.sessionState.conf.numShufflePartitions,
      ((2L * e0.count() + rowsPerTask - 1) / rowsPerTask).toInt)
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
      visited = visited
        .unionByName(next.withColumn("dist", lit(hop)))
        .transform(graft.core.Pin.apply)
      frontier = next
      done = next.isEmpty
    }
    visited
  }
}
