package graft.similarity

import org.apache.spark.mllib.linalg.distributed.{CoordinateMatrix, MatrixEntry}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** User–user cosine similarity over play-count vectors — the reference's
  * user similarity (similarity/user.py:89-126) offers DIMSUM
  * (`RowMatrix.columnSimilarities`); this module provides both:
  *
  *   - [[exact]] — join-based exact cosine on integer dot products. All
  *     sums are exact bigint math (counts), only the final sqrt is
  *     floating — deterministic across engines, so it is oracle-verifiable
  *     (q81). The item equi-join bounds pair generation to users sharing
  *     items, the sparse-cosine standard.
  *   - [[dimsum]] — sampling-based DIMSUM for the dense-user regime, via
  *     `mllib` CoordinateMatrix → RowMatrix.columnSimilarities(threshold),
  *     the scale path when exact pair enumeration is too wide.
  */
object UserCosine {

  /** Exact cosine between users u1 < u2 with score >= minCosine. */
  def exact(
      listens: DataFrame, userCol: String, itemCol: String,
      minCosine: Double): DataFrame = {
    val counts = listens.groupBy(col(userCol).as("u"), col(itemCol).as("it"))
      .agg(count(lit(1)).as("c"))
    val norms = counts.groupBy(col("u"))
      .agg(sum(col("c") * col("c")).as("norm2"))
    val a = counts.select(col("u").as("u1"), col("it"), col("c").as("c1"))
    val b = counts.select(col("u").as("u2"), col("it"), col("c").as("c2"))
    val dots = a.join(b, Seq("it"))
      .filter(col("u1") < col("u2"))
      .groupBy(col("u1"), col("u2"))
      .agg(sum(col("c1") * col("c2")).as("dot"))
    dots
      .join(norms.select(col("u").as("u1"), col("norm2").as("n1")), Seq("u1"))
      .join(norms.select(col("u").as("u2"), col("norm2").as("n2")), Seq("u2"))
      .withColumn("cosine", col("dot") / sqrt((col("n1") * col("n2")).cast("double")))
      .filter(col("cosine") >= minCosine)
      .select(col("u1"), col("u2"), col("dot"), round(col("cosine"), 6).as("cosine_r"))
  }

  /** DIMSUM approximate column similarities: users as matrix columns.
    * threshold > 0 trades exactness for sampling bounds (Zadeh & Carlson,
    * "Dimension Independent Matrix Square using MapReduce", public). */
  def dimsum(
      listens: DataFrame, userCol: String, itemCol: String,
      threshold: Double): DataFrame = {
    val spark = listens.sparkSession
    import spark.implicits._
    val counts = listens
      .groupBy(col(userCol).cast("long").as("u"), col(itemCol).as("it"))
      .agg(count(lit(1)).cast("double").as("c"))
    val itemIds = counts.select(col("it")).distinct()
      .rdd.zipWithIndex.map { case (r, i) => (r.getString(0), i) }
    val itemMap = itemIds.collectAsMap() // item dimension is the small one
    val bc = spark.sparkContext.broadcast(itemMap)
    val entries = counts.rdd.map { r =>
      MatrixEntry(bc.value(r.getString(1)), r.getLong(0), r.getDouble(2))
    }
    val sims = new CoordinateMatrix(entries).toRowMatrix()
      .columnSimilarities(threshold)
    sims.entries
      .map(e => (e.i, e.j, e.value))
      .toDF("u1", "u2", "cosine")
  }
}
