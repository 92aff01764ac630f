package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-min sketch over a key column — the sublinear frequency
  * estimator for streams and corpora whose distinct-key space is too
  * large to count exactly: token frequencies over a 100 TB corpus,
  * per-entity event counts under adversarial cardinality. The sketch is
  * a `depth × width` grid of counters; every occurrence increments one
  * counter per row (hash row `r` picks the bucket), and an estimate
  * reads the MINIMUM of a key's `depth` counters — never an
  * underestimate, over only by other keys' collisions.
  *
  * Scale shape (100 TB): the aggregation carries at most `depth ×
  * width` cells after map-side partial aggregation, REGARDLESS of the
  * corpus's distinct-key cardinality — the shuffle is bounded by the
  * sketch size, not the data (contrast the exact count's shuffle, which
  * carries every distinct key). Sketches are mergeable by cell-wise sum
  * ([[merge]]), so per-increment sketches compose into corpus totals the
  * same way the incremental stats engine merges partial aggregates.
  *
  * Two hash families, one cell-table shape (`sk_row, sk_bucket, cnt` —
  * [[merge]] and [[innerProduct]] work on either):
  *
  *  - '''md5 (oracle form)''': bucket = first `hexChars` hex chars of
  *    `md5(key ":cms" row)`, width 16^hexChars. Any engine with md5
  *    replays the sketch cell-for-cell, so a sketch result is
  *    hash-verifiable cross-engine (the property [[VectorQuantization]]
  *    exploits for scores). [[sketch]] / [[estimate]].
  *  - '''xxhash64 (production form)''': bucket = `xxhash64(key, row)
  *    mod width`, any width. One 8-byte codegen hash per cell versus
  *    md5's full digest + hex substring — measured ~5× cheaper to build
  *    at 30× (SCALE.md) — at the cost of cross-engine replayability.
  *    Same estimate guarantee (over, never under: the guarantee needs
  *    only a deterministic per-row hash, not any particular one). The
  *    q174→q179/q180 split, applied to sketches: oracle keeps md5,
  *    deployment uses this. [[sketchFast]] / [[estimateFast]].
  */
object CountMin {

  /** Bucket of `item` for hash row `row`: the first `hexChars` hex chars
    * of `md5(item ":cms" row)`. NULL items hash to NULL. */
  def bucket(item: Column, row: Int, hexChars: Int): Column =
    substring(
      md5(concat(item.cast("string"), lit(s":cms$row")).cast("binary")),
      1, hexChars)

  /** Production bucket: `xxhash64(item, row) mod width` — one codegen'd
    * 8-byte hash, no hex materialization. NULL items map to NULL (like
    * the md5 family; xxhash64 alone would hash a NULL to the seed). */
  def bucketFast(item: Column, row: Int, width: Int): Column =
    when(item.isNotNull,
      pmod(xxhash64(item.cast("string"), lit(row)), lit(width.toLong)))

  private def checkDepth(depth: Int): Unit =
    require(depth >= 1 && depth <= 16, s"depth must be in [1,16], got $depth")

  private def checkParams(depth: Int, hexChars: Int): Unit = {
    checkDepth(depth)
    require(hexChars >= 1 && hexChars <= 8,
      s"hexChars must be in [1,8], got $hexChars")
  }

  private def checkParamsFast(depth: Int, width: Int): Unit = {
    checkDepth(depth)
    require(width >= 1 && width <= (1 << 27),
      s"width must be in [1,2^27], got $width")
  }

  // shared builder: one row per populated cell over any bucket family
  private def sketchWith(
      df: DataFrame, itemCol: String, depth: Int,
      bucketOf: (Column, Int) => Column): DataFrame = {
    val cells = (0 until depth).map(r =>
      struct(lit(r).as("sk_row"),
        bucketOf(col(itemCol), r).as("sk_bucket")))
    df.filter(col(itemCol).isNotNull)
      .select(explode(array(cells: _*)).as("__c"))
      .groupBy(col("__c.sk_row").as("sk_row"),
        col("__c.sk_bucket").as("sk_bucket"))
      .agg(count(lit(1)).as("cnt"))
  }

  private def estimateWith(
      sk: DataFrame, items: DataFrame, itemCol: String, depth: Int,
      bucketOf: (Column, Int) => Column): DataFrame = {
    require(!items.columns.contains("cms_count"),
      "input already has a cms_count column — rename it before estimating")
    val cells = (0 until depth).map(r =>
      struct(lit(r).as("sk_row"),
        bucketOf(col(itemCol), r).as("sk_bucket")))
    val probes = items
      .select(col(itemCol), explode(array(cells: _*)).as("__c"))
      .select(col(itemCol), col("__c.sk_row").as("sk_row"),
        col("__c.sk_bucket").as("sk_bucket"))
    probes
      .join(broadcast(sk), Seq("sk_row", "sk_bucket"), "left")
      // an absent cell IS a zero counter — coalesce BEFORE the min, or a
      // key with one empty cell would report its other cells' collisions
      .withColumn("__cell", coalesce(col("cnt"), lit(0L)))
      .groupBy(col(itemCol))
      .agg(min(col("__cell")).as("cms_count"))
      .join(broadcast(items), Seq(itemCol))
  }

  /** Build the md5-family sketch: one row per populated cell,
    * `(sk_row, sk_bucket, cnt)`. NULL keys are dropped (they carry no
    * frequency). Width is 16^`hexChars`; ε ≈ e / width, δ ≈ e^-depth. */
  def sketch(
      df: DataFrame, itemCol: String,
      depth: Int = 4, hexChars: Int = 3): DataFrame = {
    checkParams(depth, hexChars)
    sketchWith(df, itemCol, depth, bucket(_, _, hexChars))
  }

  /** Build the production xxhash64-family sketch (long buckets in
    * [0, width)). Same cell-table shape and guarantees as [[sketch]];
    * ε ≈ e / width, δ ≈ e^-depth. */
  def sketchFast(
      df: DataFrame, itemCol: String,
      depth: Int = 4, width: Int = 4096): DataFrame = {
    checkParamsFast(depth, width)
    sketchWith(df, itemCol, depth, bucketFast(_, _, width))
  }

  /** Cell-wise sum of sketches built with the SAME hash family and
    * parameters — the property that makes the sketch incremental:
    * sketch(A ∪ B) = merge(sketch(A), sketch(B)). */
  def merge(sketches: DataFrame*): DataFrame = {
    require(sketches.nonEmpty, "merge of zero sketches")
    sketches.reduce(_ unionByName _)
      .groupBy(col("sk_row"), col("sk_bucket"))
      .agg(sum(col("cnt")).as("cnt"))
  }

  // a sketch's depth is self-describing: rows 0..depth-1 all populate
  // for any non-empty input (every occurrence hits one bucket per row)
  private def depthOf(sk: DataFrame): Int = {
    val r = sk.agg(max(col("sk_row"))).collect()(0)
    if (r.isNullAt(0)) 0 else r.getAs[Number](0).intValue() + 1
  }

  /** Equi-join cardinality estimate from TWO sketches built with the
    * same hash family and parameters: |A ⋈ B| on the sketched key is
    * Σ_k fA(k)·fB(k), and each sketch row's cell-wise inner product
    * Σ_b cntA[r,b]·cntB[r,b] over-counts that by hash collisions only —
    * so the MIN over rows is a guaranteed OVER-estimate that needs
    * neither relation, just two depth×width cell tables (the AMS/CMS
    * join-size technique; this is how a planner sizes a shuffle join
    * before running it, from sketches maintained incrementally via
    * [[merge]]). Returns one row: `(join_size_est)`.
    *
    * Depth is derived FROM the sketches (max sk_row + 1 on each side,
    * required equal) rather than trusted as a parameter: a mis-passed
    * depth would silently corrupt the estimate (larger than the real
    * depth always yields 0; smaller defeats the all-rows-collide
    * emptiness proof). The two scalar reads are driver anchors over
    * cell tables bounded by depth×width, never the data.
    *
    * Tightness: a shared key populates its bucket in EVERY row on both
    * sides, so any row with NO coinciding populated cells proves the
    * true join is empty — the estimate is 0 unless all `depth` rows
    * collide somewhere, in which case it's the minimum row product. */
  def innerProduct(skA: DataFrame, skB: DataFrame): DataFrame = {
    val (dA, dB) = (depthOf(skA), depthOf(skB))
    if (dA == 0 || dB == 0)
      // an empty sketch is an empty relation: the true join size is 0
      // regardless of the other side — checked BEFORE the depth-equality
      // guard, which would otherwise fire on (0, d) and turn a
      // well-defined answer into an exception
      return skA.sparkSession.range(1).select(lit(0L).as("join_size_est"))
    require(dA == dB,
      s"sketches built with different depths: $dA vs $dB — estimates " +
        "across mismatched grids are meaningless")
    skA.join(skB.select(col("sk_row"), col("sk_bucket"),
        col("cnt").as("__cnt_b")), Seq("sk_row", "sk_bucket"))
      .groupBy(col("sk_row"))
      .agg(sum(col("cnt") * col("__cnt_b")).as("__row_ip"))
      .agg(min(col("__row_ip")).as("__est"),
        count(lit(1)).as("__rows_hit"))
      .select(when(col("__rows_hit") < dA, lit(0L))
        .otherwise(coalesce(col("__est"), lit(0L)))
        .as("join_size_est"))
  }

  /** Point estimates for `items` (a broadcast-sized key list) against an
    * md5-family sketch: adds `cms_count` = min over the key's `depth`
    * cells, 0 for keys whose cells are all empty. Guaranteed
    * `cms_count >= true count` for every key when (depth, hexChars)
    * match the sketch's. Both sides of the probe are broadcast-sized:
    * the sketch holds at most depth × 16^hexChars populated cells and
    * `items` is a key list — the corpus itself is never touched at
    * estimate time. */
  def estimate(
      sk: DataFrame, items: DataFrame, itemCol: String,
      depth: Int = 4, hexChars: Int = 3): DataFrame = {
    checkParams(depth, hexChars)
    estimateWith(sk, items, itemCol, depth, bucket(_, _, hexChars))
  }

  /** Point estimates against an xxhash64-family sketch built by
    * [[sketchFast]] with the same (depth, width). Same guarantee and
    * probe shape as [[estimate]]. */
  def estimateFast(
      sk: DataFrame, items: DataFrame, itemCol: String,
      depth: Int = 4, width: Int = 4096): DataFrame = {
    checkParamsFast(depth, width)
    estimateWith(sk, items, itemCol, depth, bucketFast(_, _, width))
  }
}
