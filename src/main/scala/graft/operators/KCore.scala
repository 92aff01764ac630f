package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** k-core decomposition by synchronized peeling — the standard graph
  * filter for "dense enough to trust" regions: drop every node whose
  * degree is below k, which lowers neighbors' degrees, and repeat. The
  * k-core is the fixpoint: the maximal subgraph where every node keeps
  * ≥ k neighbors. In this engine's context it grades the dedup/
  * similarity pair graphs the way [[Triangles]] does (a near-dup
  * cluster that survives a high k is a real community; a chain of
  * borderline matches peels away), and it is the classic spam/authority
  * prefilter before [[MassRank]]-style propagation.
  *
  * `rounds` is an EXPLICIT parameter, not a driver-side convergence
  * loop: each round is one degree aggregate plus two semi-joins, all
  * replayable, so a fixed round count makes the whole decomposition
  * SQL-unrollable (q220 oracles it round-for-round) and bounds the job
  * graph. Peeling converges in at most O(peel depth) rounds — on real
  * graphs a handful (the synthetic fixtures reach fixpoint in 2; a path
  * graph peels one layer per round, the worst case KCoreSpec pins) —
  * and extra rounds past the fixpoint are exact no-ops, so callers pick
  * a small bound and verify with [[core]]'s idempotence rather than
  * looping until quiescence on the driver.
  *
  * Scale shape (100 TB): per round ONE map-side-combinable degree
  * aggregate and TWO semi-joins of the edge list against the (smaller)
  * surviving-node set — the q145 propagation shape; the edge list
  * localCheckpoints each round so lineage stays flat (reliable
  * checkpoints on a cluster).
  */
object KCore {

  /** Surviving `(node, core_degree)` rows after `rounds` peel
    * iterations at threshold `k` over the undirected simple graph of
    * `edges` (direction ignored, self-loops and duplicates dropped).
    * Empty when the k-core is empty. */
  def core(
      edges: DataFrame, srcCol: String, dstCol: String,
      k: Int, rounds: Int = 4): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(rounds >= 1 && rounds <= 64,
      s"rounds must be in [1,64], got $rounds")
    val und = edges.filter(col(srcCol) =!= col(dstCol))
      .select(least(col(srcCol), col(dstCol)).as("a"),
        greatest(col(srcCol), col(dstCol)).as("b"))
      .distinct()
    var e = und.unionByName(
        und.select(col("b").as("a"), col("a").as("b")))
      .transform(graft.core.Pin.apply)
    for (_ <- 1 to rounds) {
      val keep = e.groupBy(col("a")).agg(count(lit(1)).as("__d"))
        .filter(col("__d") >= k).select(col("a"))
        .transform(graft.core.Pin.apply) // consumed by both endpoint semi-joins
      e = e.join(keep, Seq("a"), "left_semi")
        .join(keep.select(col("a").as("b")), Seq("b"), "left_semi")
        .transform(graft.core.Pin.apply)
    }
    e.groupBy(col("a").as("node"))
      .agg(count(lit(1)).as("core_degree"))
  }
}
