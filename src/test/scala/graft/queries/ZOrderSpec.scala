package graft.queries

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.operators.ZOrder

/** Z-order: known Morton codes, the multi-dimension locality property
  * the layout exists for, masking, and guards. */
class ZOrderSpec extends SparkSpec {

  test("known morton codes interleave bits correctly") {
    import spark.implicits._
    val got = Seq((3L, 5L), (0L, 0L), (7L, 0L), (0L, 7L))
      .toDF("x", "y")
      .withColumn("z", ZOrder.zValue(Seq(col("x"), col("y")), bits = 3))
      .orderBy(col("x"), col("y"))
      .select("z").as[Long].collect()
    // (3,5): x bits at even lanes, y bits at odd → 1+2+4+32 = 39
    // (7,0): 1+4+16 = 21; (0,7): 2+8+32 = 42
    assert(got.sameElements(Array(0L, 42L, 39L, 21L)))
  }

  test("z-layout bounds EVERY dimension per partition; 1-d sort does not") {
    import spark.implicits._
    // a 64x64 grid; z-order into 16 range partitions => each partition is
    // a contiguous z span of ~256 cells = a compact spatial block, so the
    // per-partition y-spread stays small. An x-sorted layout gives every
    // partition the full y range.
    val grid = (for (x <- 0 until 64; y <- 0 until 64)
      yield (x.toLong, y.toLong)).toDF("x", "y")
    def spreads(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long)] =
      df.withColumn("pid", spark_partition_id())
        .groupBy("pid")
        .agg((max("x") - min("x")).as("sx"), (max("y") - min("y")).as("sy"))
        .select("sx", "sy").as[(Long, Long)].collect().toSeq
    val zed = spreads(ZOrder.layout(grid, Seq("x", "y"), bits = 6,
      partitions = 16))
    val linear = spreads(grid.repartitionByRange(16, col("x"))
      .sortWithinPartitions(col("x")))
    val zAvgY = zed.map(_._2).sum.toDouble / zed.size
    val linAvgY = linear.map(_._2).sum.toDouble / linear.size
    assert(zAvgY < linAvgY / 2,
      s"z layout y-spread $zAvgY not < half of linear $linAvgY")
    // and the z layout still bounds x on average (no dimension is
    // sacrificed; individual partitions may straddle a quadrant seam)
    val zAvgX = zed.map(_._1).sum.toDouble / zed.size
    assert(zAvgX < 40, s"z layout x-spread $zAvgX not block-bounded")
  }

  test("masking keeps out-of-range values in their bit lanes; guards") {
    import spark.implicits._
    val df = Seq((1000000L, 3L)).toDF("x", "y")
    val z = df.select(ZOrder.zValue(
      Seq(ZOrder.zBucket(col("x"), 4), ZOrder.zBucket(col("y"), 4)),
      bits = 4).as("z")).as[Long].collect()
    // 1000000 & 15 = 64? no: 1000000 = 0xF4240, & 0xF = 0 → x lanes empty
    assert(z.sameElements(Array(2L + 8L)), "y=3 -> odd lanes 1 and 3")
    intercept[IllegalArgumentException](ZOrder.zValue(Seq.empty, 4))
    intercept[IllegalArgumentException](
      ZOrder.zValue(Seq(col("x"), col("y")), 32))
    intercept[IllegalArgumentException](
      ZOrder.layout(df.withColumn("zval", lit(1L)), Seq("x"), 4, 2))
  }
}
