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
  * Determinism: the hash family is `md5(key ":cms" row)` truncated to
  * `hexChars` hex characters — the bucket id IS the hex prefix (width =
  * 16^hexChars), so there is no hex→integer conversion and any engine
  * with md5 replays the sketch cell-for-cell. Estimates are exact
  * integer minima, so a sketch result is hash-verifiable cross-engine
  * (the same property [[VectorQuantization]] exploits for scores).
  */
object CountMin {

  /** Bucket of `item` for hash row `row`: the first `hexChars` hex chars
    * of `md5(item ":cms" row)`. NULL items hash to NULL. */
  def bucket(item: Column, row: Int, hexChars: Int): Column =
    substring(
      md5(concat(item.cast("string"), lit(s":cms$row")).cast("binary")),
      1, hexChars)

  private def checkParams(depth: Int, hexChars: Int): Unit = {
    require(depth >= 1 && depth <= 16, s"depth must be in [1,16], got $depth")
    require(hexChars >= 1 && hexChars <= 8,
      s"hexChars must be in [1,8], got $hexChars")
  }

  /** Build the sketch: one row per populated cell,
    * `(sk_row, sk_bucket, cnt)`. NULL keys are dropped (they carry no
    * frequency). Width is 16^`hexChars`; ε ≈ e / width, δ ≈ e^-depth. */
  def sketch(
      df: DataFrame, itemCol: String,
      depth: Int = 4, hexChars: Int = 3): DataFrame = {
    checkParams(depth, hexChars)
    val cells = (0 until depth).map(r =>
      struct(lit(r).as("sk_row"),
        bucket(col(itemCol), r, hexChars).as("sk_bucket")))
    df.filter(col(itemCol).isNotNull)
      .select(explode(array(cells: _*)).as("__c"))
      .groupBy(col("__c.sk_row").as("sk_row"),
        col("__c.sk_bucket").as("sk_bucket"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Cell-wise sum of sketches built with the SAME (depth, hexChars) —
    * the property that makes the sketch incremental: sketch(A ∪ B) =
    * merge(sketch(A), sketch(B)). */
  def merge(sketches: DataFrame*): DataFrame = {
    require(sketches.nonEmpty, "merge of zero sketches")
    sketches.reduce(_ unionByName _)
      .groupBy(col("sk_row"), col("sk_bucket"))
      .agg(sum(col("cnt")).as("cnt"))
  }

  /** Equi-join cardinality estimate from TWO sketches built with the
    * same (depth, hexChars): |A ⋈ B| on the sketched key is
    * Σ_k fA(k)·fB(k), and each sketch row's cell-wise inner product
    * Σ_b cntA[r,b]·cntB[r,b] over-counts that by hash collisions only —
    * so the MIN over rows is a guaranteed OVER-estimate that needs
    * neither relation, just two depth×16^hexChars cell tables (the
    * AMS/CMS join-size technique; this is how a planner sizes a shuffle
    * join before running it, from sketches maintained incrementally via
    * [[merge]]). Returns one row: `(join_size_est)`.
    *
    * Tightness: a shared key populates its bucket in EVERY row on both
    * sides, so any row with NO coinciding populated cells proves the
    * true join is empty — the estimate is 0 unless all `depth` rows
    * collide somewhere, in which case it's the minimum row product. */
  def innerProduct(skA: DataFrame, skB: DataFrame, depth: Int = 4): DataFrame =
    skA.join(skB.select(col("sk_row"), col("sk_bucket"),
        col("cnt").as("__cnt_b")), Seq("sk_row", "sk_bucket"))
      .groupBy(col("sk_row"))
      .agg(sum(col("cnt") * col("__cnt_b")).as("__row_ip"))
      .agg(min(col("__row_ip")).as("__est"),
        count(lit(1)).as("__rows_hit"))
      .select(when(col("__rows_hit") < depth, lit(0L))
        .otherwise(coalesce(col("__est"), lit(0L)))
        .as("join_size_est"))

  /** Point estimates for `items` (a broadcast-sized key list): adds
    * `cms_count` = min over the key's `depth` cells, 0 for keys whose
    * cells are all empty. Guaranteed `cms_count >= true count` for every
    * key when (depth, hexChars) match the sketch's. Both sides of the
    * probe are broadcast-sized: the sketch holds at most depth ×
    * 16^hexChars populated cells and `items` is a key list — the corpus
    * itself is never touched at estimate time. */
  def estimate(
      sk: DataFrame, items: DataFrame, itemCol: String,
      depth: Int = 4, hexChars: Int = 3): DataFrame = {
    checkParams(depth, hexChars)
    require(!items.columns.contains("cms_count"),
      "input already has a cms_count column — rename it before estimating")
    val cells = (0 until depth).map(r =>
      struct(lit(r).as("sk_row"),
        bucket(col(itemCol), r, hexChars).as("sk_bucket")))
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
}
