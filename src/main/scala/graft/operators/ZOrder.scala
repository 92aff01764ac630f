package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) data layout — multi-dimensional clustering for scan
  * pruning: interleaving the bits of several key columns gives a single
  * sort key under which a contiguous file span is simultaneously
  * range-bounded in EVERY dimension, so parquet footer min/max statistics
  * prune scans filtered on any of the keys — not just the leading sort
  * column. This is the standard remedy (Delta/Iceberg `OPTIMIZE ZORDER
  * BY`) for the 100 TB table queried sometimes by user, sometimes by
  * time, sometimes by entity, where a lexicographic sort serves only the
  * first predicate.
  *
  * The z-value is a pure per-row bit expression (shift/and/or — codegen,
  * engine-portable, no UDF); the layout step is one range repartition by
  * z-value plus an intra-partition sort — exactly the shuffle a plain
  * sorted write would pay, so the multi-dimension locality is free.
  */
object ZOrder {

  /** Morton code of `cols`: bit `b` of column `c` lands at position
    * `b * cols.size + c`. Columns must already be non-negative and fit
    * `bits` bits (callers bucketize first — [[zBucket]] helps); values
    * outside the range are masked to their low `bits` bits rather than
    * corrupting neighbours' bit lanes. */
  def zValue(cols: Seq[Column], bits: Int): Column = {
    require(cols.nonEmpty, "zValue of zero columns")
    require(bits >= 1 && bits * cols.size <= 62,
      s"bits * columns must fit a bigint: $bits * ${cols.size}")
    val n = cols.size
    val terms = for {
      b <- 0 until bits
      (c, i) <- cols.zipWithIndex
    } yield shiftleft(
      shiftright(c.cast("long"), b).bitwiseAND(lit(1L)), b * n + i)
    terms.reduce(_ + _)
  }

  /** Bucketize an arbitrary long into `bits` bits by masking — the
    * id-like case. For value columns with range structure, bucketize by
    * range first, then mask. */
  def zBucket(c: Column, bits: Int): Column =
    c.cast("long").bitwiseAND(lit((1L << bits) - 1))

  /** Rewrite `df` in z-order on `cols` (masked to `bits` bits each):
    * adds `zval`, range-repartitions on it into `partitions` output
    * files, sorts within each. Writing the result gives every file a
    * tight min/max envelope in every constituent dimension. */
  def layout(
      df: DataFrame, cols: Seq[String], bits: Int,
      partitions: Int): DataFrame = {
    require(partitions >= 1, s"partitions must be >= 1, got $partitions")
    require(!df.columns.contains("zval"),
      "input already has a zval column — rename it before z-ordering")
    df.withColumn("zval",
        zValue(cols.map(c => zBucket(col(c), bits)), bits))
      .repartitionByRange(partitions, col("zval"))
      .sortWithinPartitions(col("zval"))
  }
}
