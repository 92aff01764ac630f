package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed triangle counting — the density diagnostic for the
  * dedup/similarity pair graphs this engine produces (a near-dup
  * component full of triangles is a genuine cluster; a triangle-free
  * straggly one is chained false positives — the adversarial case the
  * large-star/small-star fallback in [[graft.dedup.Clusters]] exists
  * for), and the classic market-basket co-occurrence metric.
  *
  * Algorithm: degree orientation (Schank's node-iterator++, the
  * standard shared-nothing formulation — e.g. Suri & Vassilvitskii,
  * WWW'11): orient every undirected edge from its LOWER-degree
  * endpoint to the higher (ties by id), enumerate wedges only from
  * out-neighbor pairs, and close each wedge against the oriented edge
  * set. Every triangle is counted exactly once, and the wedge count is
  * Σ d_out(v)² with d_out ≤ O(√m) on any graph — the orientation
  * flattens power-law hubs, turning the quadratic-in-degree blowup a
  * naive wedge join pays on its hottest node into a √m bound. Wedge
  * generation and the closing join are both equi-joins on edge keys —
  * two shuffles, no theta join, no per-node memory assumption beyond
  * the out-neighborhood.
  */
object Triangles {

  /** Canonicalize an edge list to distinct undirected edges `(a, b)`
    * with `a < b`, self-loops dropped. */
  def canonical(edges: DataFrame, src: String, dst: String): DataFrame =
    edges.filter(col(src) =!= col(dst))
      .select(least(col(src), col(dst)).as("a"),
        greatest(col(src), col(dst)).as("b"))
      .distinct()

  /** Orient canonical edges low-degree → high-degree (ties by id):
    * `(u, v)` with `(deg, id)` of `u` < of `v` lexicographically. */
  def orient(canonicalEdges: DataFrame): DataFrame = {
    val deg = canonicalEdges.select(col("a").as("n"))
      .unionAll(canonicalEdges.select(col("b").as("n")))
      .groupBy(col("n")).agg(count(lit(1)).as("deg"))
    canonicalEdges
      .join(deg.select(col("n").as("a"), col("deg").as("da")), Seq("a"))
      .join(deg.select(col("n").as("b"), col("deg").as("db")), Seq("b"))
      .select(
        when(col("da") < col("db") ||
          (col("da") === col("db") && col("a") < col("b")),
          col("a")).otherwise(col("b")).as("u"),
        when(col("da") < col("db") ||
          (col("da") === col("db") && col("a") < col("b")),
          col("b")).otherwise(col("a")).as("v"))
  }

  /** Per-node triangle participation counts `(node, n_triangles)` —
    * every node of each triangle credited once; triangle-free nodes
    * absent. */
  def perNode(edges: DataFrame, src: String, dst: String): DataFrame =
    triangles(edges, src, dst)
      // explode, not 3 unions: one pass over the triangle set
      .select(explode(array(col("x"), col("y"), col("z"))).as("node"))
      .groupBy(col("node")).agg(count(lit(1)).as("n_triangles"))

  /** DOULION edge-sampled triangle estimate (Tsourakakis, Kang &
    * Faloutsos, KDD'09) — the 100 TB regime's answer when even the
    * degree-oriented exact count is wedge-bound (q191 measured 18× at
    * 30×: Σ d_out² grows with density): keep each canonical edge
    * independently with probability `keepHex/16`, count triangles
    * EXACTLY on the sampled graph (the machinery above, bloom prune
    * included), and scale by (16/keepHex)³ — every surviving triangle
    * needed all three of its edges kept, so the estimator is unbiased
    * with concentration bounds from the paper. Sampling cuts the edge
    * set by p, the wedge volume by ~p², and the dominant close shuffle
    * by ~p³.
    *
    * The coin is DETERMINISTIC — first md5 hex char of "a:b:salt" below
    * `keepHex` — the engine's seeded-sampling discipline (q79), so two
    * runs or two ENGINES sample the identical edge set and the whole
    * estimate is hash-reproducible (q217 replays it in SQL).
    * `keepHex` must divide 16 so the scale factor stays an exact
    * integer. Output one row: (sampled_triangles, doulion_estimate). */
  def doulion(
      edges: DataFrame, src: String, dst: String,
      keepHex: Int = 8, salt: String = "doulion",
      maxBloomEdges: Long = 4000000L): DataFrame = {
    require(Set(1, 2, 4, 8, 16).contains(keepHex),
      s"keepHex must divide 16 for an integer-exact estimator, got $keepHex")
    val c = canonical(edges, src, dst)
    val coin = substring(md5(concat_ws(":",
      col("a").cast("string"), col("b").cast("string"), lit(salt))), 1, 1)
    val keep = "0123456789abcdef".take(keepHex).map(_.toString)
    val f = 16L / keepHex
    // the sampled set is already canonical — skip the redundant
    // distinct exchange a re-canonicalization would pay
    trianglesOfCanonical(
        c.filter(coin.isin(keep: _*)).transform(graft.core.Pin.apply),
        maxBloomEdges)
      .agg(count(lit(1)).as("sampled_triangles"))
      .select(col("sampled_triangles"),
        (col("sampled_triangles") * lit(f * f * f))
          .as("doulion_estimate"))
  }

  /** All triangles `(x, y, z)` with `x < y < z`, each exactly once.
    * Wedge step: out-neighbor pairs of each oriented center; close
    * step: semi-check the third edge against the oriented edge set. */
  def triangles(
      edges: DataFrame, src: String, dst: String,
      maxBloomEdges: Long = 4000000L): DataFrame =
    // the edge set feeds FIVE plan positions (degrees twice, both wedge
    // sides, the close); materialize canonical + oriented once instead
    // of re-deriving the upstream pair join per consumer
    trianglesOfCanonical(
      canonical(edges, src, dst).transform(graft.core.Pin.apply),
      maxBloomEdges)

  /** [[triangles]] over an ALREADY-canonical, already-pinned `(a, b)`
    * edge set — the entry point for callers that run several counting
    * passes over the same graph (q217 computes the exact count AND the
    * sampled estimate side by side): re-pinning the canonical set per
    * pass would hold one extra materialized edge copy per consumer,
    * which at 30× is the difference between fitting the default probe
    * heap and not. */
  def trianglesOfCanonical(
      c: DataFrame, maxBloomEdges: Long = 4000000L): DataFrame = {
    val o = orient(c).transform(graft.core.Pin.apply)
    // wedges centered at u: out-neighbor pairs stated once as
    // (v1 < v2 by id); in the acyclic degree orientation each triangle
    // has exactly ONE node with two out-edges, so each triangle is one
    // wedge — closed against the CANONICAL (a < b) edge set, keeping
    // the close a pure two-key equi-join (no OR condition, which would
    // plan as a nested loop)
    val w = o.select(col("u"), col("v").as("v1"))
      .join(o.select(col("u"), col("v").as("v2")), Seq("u"))
      .filter(col("v1") < col("v2"))
    // Bloom-prune wedges BEFORE the close exchange when the edge set is
    // small enough for the filter to stay cache-resident: wedge volume
    // is Σ d_out² while triangles are typically a small fraction of it,
    // so probing each wedge's (v1, v2) against a bloom over the edge
    // set (8-byte xxhash64 keys, the q178 recipe) keeps
    // ~(1 − density − fpp) of the wedges out of the close shuffle,
    // map-side and codegen'd. The cutoff is EMPIRICAL, not cosmetic:
    // measured at 34M edges the ~40 MB filter turns every probe into a
    // last-level-cache miss and the "optimization" DOUBLES the runtime
    // (289 s vs 146 s at 30× sf0.1), while at 1.2M edges (~1.4 MB,
    // cache-resident) it cuts 20%. False positives are removed by the
    // exact join below either way — the filter is never a correctness
    // gate, so skipping it is always sound.
    val m = c.count()
    val wp = if (m <= maxBloomEdges) {
      val bytes = BloomPrune.bloomBytesLong(
        c.select(xxhash64(col("a"), col("b")).as("__graft_ek")),
        "__graft_ek", expectedItems = m, fpp = 0.01)
      graft.functions.GraftFunctions.register(c.sparkSession)
      w.filter(graft.functions.GraftFunctions.bloomContains(
        xxhash64(col("v1"), col("v2")), lit(bytes)))
    } else w
    wp.join(c, col("v1") === col("a") && col("v2") === col("b"))
      .select(least(col("u"), col("v1"), col("v2")).as("x"),
        when(col("u") =!= least(col("u"), col("v1"), col("v2")) &&
          col("u") =!= greatest(col("u"), col("v1"), col("v2")), col("u"))
          .when(col("v1") =!= least(col("u"), col("v1"), col("v2")) &&
            col("v1") =!= greatest(col("u"), col("v1"), col("v2")),
            col("v1"))
          .otherwise(col("v2")).as("y"),
        greatest(col("u"), col("v1"), col("v2")).as("z"))
  }
}
