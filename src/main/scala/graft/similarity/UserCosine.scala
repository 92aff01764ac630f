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

  /** Exact cosine between users u1 < u2 with score >= minCosine.
    *
    * Each user's play vector is densified over the (small) item vocabulary
    * into an integer array, then pairs come from a broadcast self-join —
    * no item-keyed shuffle (with few items that join is maximally skewed:
    * one reducer per item) and the dot product is a single zip_with per
    * pair. All integer math → order-insensitive and exact, so results are
    * identical to the join-based formulation the DuckDB oracle uses.
    * This is the exact/small-vocabulary path; [[dimsum]] is the wide one. */
  def exact(
      listens: DataFrame, userCol: String, itemCol: String,
      minCosine: Double): DataFrame = {
    val counts = listens.groupBy(col(userCol).as("u"), col(itemCol).as("it"))
      .agg(count(lit(1)).as("c"))
    // global item order: the dense-vector index space
    val items = counts.select(col("it")).distinct()
      .orderBy(col("it")).collect().map(_.get(0))
    // counts are small integers — exact in float (< 2^24), products exact
    // in double — so the codegen'd FloatVectorDot gives the same integer
    // dot as bigint arithmetic, at a fraction of the per-pair cost
    graft.functions.GraftFunctions.register(listens.sparkSession)
    import graft.functions.GraftFunctions.vecDot
    val vecs = counts
      .groupBy(col("u"))
      .agg(map_from_entries(collect_list(struct(col("it"), col("c"))))
        .as("m"))
      .select(col("u"),
        array(items.map(i =>
          coalesce(element_at(col("m"), lit(i)), lit(0L)).cast("float")): _*)
          .as("v"))
      .withColumn("norm2", vecDot(col("v"), col("v")).cast("long"))
    val a = vecs.select(col("u").as("u1"), col("v").as("v1"),
      col("norm2").as("n1"))
    val b = vecs.select(col("u").as("u2"), col("v").as("v2"),
      col("norm2").as("n2"))
    a.join(broadcast(b), col("u1") < col("u2"))
      .withColumn("dot", vecDot(col("v1"), col("v2")).cast("long"))
      .withColumn("cosine",
        col("dot") / sqrt((col("n1") * col("n2")).cast("double")))
      // dot > 0 preserves join-based semantics: users sharing no items
      // produce no pair (not a zero-cosine row)
      .filter(col("dot") > 0 && col("cosine") >= minCosine)
      .select(col("u1"), col("u2"), col("dot"),
        round(col("cosine"), 6).as("cosine_r"))
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
