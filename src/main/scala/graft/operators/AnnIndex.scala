package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions

/** Persisted, incrementally-maintained ANN index — the embedding-side
  * twin of the incremental MinHash text index (q139): the corpus is
  * indexed ONCE into (bucket, int8 code) rows stored as plain parquet;
  * a new embedding batch appends its own rows in O(batch); and probes
  * (new arrivals, user queries) join the index on the bucket — the
  * corpus's float embeddings are never re-read, never re-quantized,
  * never rescanned. At 27 B indexed vectors with a daily batch, the
  * daily cost is the batch's signatures plus a batch×bucket-slice join,
  * not a corpus pass.
  *
  * Composition of two proven layers: q127's signed-random-projection
  * buckets bound WHICH index rows a probe reads; q138's int8 codes
  * shrink WHAT each read moves (4× smaller, exact integer dots). Both
  * layers are deterministic, so index contents and probe results stay
  * hash-verifiable cross-engine.
  */
object AnnIndex {

  /** The ONE bucket rule (shared with q127/q144 via
    * [[graft.queries.SimOps]]): sign-bit signature of the float dots
    * against `planes` (`(pid, pv)` — the sampled hyperplanes). Requires
    * [[GraftFunctions.register]] on the session. */
  def buckets(e: DataFrame, idCol: String, vecCol: String,
      planes: DataFrame): DataFrame =
    e.crossJoin(broadcast(planes))
      .select(col(idCol),
        when(GraftFunctions.vecDot(col(vecCol), col("pv")) > 0,
          expr("shiftleft(1L, cast(pid as int))")).otherwise(0L).as("bit"))
      .groupBy(col(idCol))
      .agg(sum(col("bit")).as("bucket"))

  /** Index rows for a corpus or batch: `(id, bucket, q8, qnorm2)` —
    * bucket for probe pruning, int8 codes for the candidate scan. Write
    * the result to parquet (partitioned by bucket at real scale) and it
    * IS the durable index; appending a batch is just writing its rows. */
  def indexRows(e: DataFrame, idCol: String, vecCol: String,
      planes: DataFrame): DataFrame =
    VectorQuantization.quantizeInt8(e, vecCol)
      .join(buckets(e, idCol, vecCol, planes), Seq(idCol))
      .select(col(idCol), col("bucket"), col("q8"), col("qnorm2"))

  /** Top-`k` index neighbours per probe row (probes are [[indexRows]] of
    * the query vectors): bucket-equality candidates, exact integer dots,
    * quantized-cosine ranking, ties to the lowest index id. Probe side
    * is broadcast (a batch/query set); only the probed buckets' index
    * rows are read. */
  def topK(index: DataFrame, probes: DataFrame, k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid")).orderBy(col("qcos").desc, col("vid"))
    val q = probes.select(col(probes.columns.head).as("qid"),
      col("bucket"), col("q8").as("qa"), col("qnorm2").as("qn2a"))
    val c = index.select(col(index.columns.head).as("vid"),
      col("bucket"), col("q8").as("qb"), col("qnorm2").as("qn2b"))
    broadcast(q).join(c, Seq("bucket"))
      .filter(col("qid") =!= col("vid"))
      .withColumn("qdot",
        VectorQuantization.int8Dot(col("qa"), col("qb")))
      .withColumn("qcos", VectorQuantization.quantizedCosine(
        col("qdot"), col("qn2a"), col("qn2b")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("vid"), col("qdot"),
        round(col("qcos"), 6).as("qcos_r"))
  }
}
