package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Int8 scalar quantization for embedding columns — the standard memory
  * lever for large-scale similarity search: a 4-byte float dimension
  * becomes a 1-byte code (per-vector symmetric scale, 127 levels), so a
  * candidate scan moves 4× less data and integer dot products replace
  * float ones. Exact float cosine stays the verification baseline
  * (q50); quantized scoring is the 100 TB candidate-scan path, re-ranked
  * exactly on the (tiny) surviving set if needed.
  *
  * Everything here is deterministic and engine-portable: the scale is
  * 127 / max|x_i| (doubles), codes are round-half-away-from-zero (the
  * rounding both Spark and DuckDB implement), and quantized dots are
  * exact integer arithmetic — so a quantized ANN result can be
  * hash-verified across engines, unlike float-accumulation scores.
  */
object VectorQuantization {

  /** Add `q8` (int8-range codes; array<int> for arithmetic headroom) and
    * `qnorm2` (integer squared norm of the codes) for `vecCol`. Zero
    * vectors quantize to all-zero codes. Runs through the codegen'd
    * [[graft.functions.Int8QuantizeCodes]] loop (registered on the
    * session here, idempotently) — value-identical to
    * [[quantizeInt8Declarative]], which stays as the registration-free
    * executable statement of the semantics. */
  def quantizeInt8(df: DataFrame, vecCol: String): DataFrame = {
    val reserved = Seq("q8", "qnorm2", "__qz").filter(df.columns.contains)
    require(reserved.isEmpty,
      s"input already has output column(s) ${reserved.mkString(", ")} — " +
        "rename them before quantizing")
    graft.functions.GraftFunctions.register(df.sparkSession)
    df.withColumn("__qz",
        graft.functions.GraftFunctions.int8Quantize(col(vecCol)))
      .withColumn("q8", col("__qz.q8"))
      .withColumn("qnorm2", col("__qz.qnorm2"))
      .drop("__qz")
  }

  /** The declarative reference form of [[quantizeInt8]] — five chained
    * higher-order functions, exactly the construction the DuckDB oracles
    * replay. Interpreted (≈0.4 ms/row at 64 dims), so the hot paths use
    * the codegen expression; QuantizationSpec holds the two equal on
    * randomized vectors. */
  def quantizeInt8Declarative(df: DataFrame, vecCol: String): DataFrame = {
    val reserved = Seq("q8", "qnorm2", "__scale").filter(df.columns.contains)
    require(reserved.isEmpty,
      s"input already has output column(s) ${reserved.mkString(", ")} — " +
        "rename them before quantizing")
    df
      .withColumn("__scale",
        lit(127.0) / greatest(
          array_max(transform(col(vecCol), x => abs(x.cast("double")))),
          lit(1e-30)))
      .withColumn("q8",
        transform(col(vecCol),
          x => round(x.cast("double") * col("__scale")).cast("int")))
      .withColumn("qnorm2", int8Dot(col("q8"), col("q8")))
      .drop("__scale")
  }

  /** Exact integer dot product of two code arrays (bigint — 64 dims of
    * ±127 peaks at ~10^6, but the accumulator stays overflow-proof for
    * any realistic dimensionality under ANSI mode). */
  def int8Dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => (x.cast("long") * y.cast("long"))),
      lit(0L), (acc, v) => acc + v)

  /** Quantized cosine: integer dot normalized by the integer code norms.
    * A ratio of exact integers through IEEE doubles — bit-reproducible
    * anywhere, unlike a float-accumulated cosine. */
  def quantizedCosine(dot: Column, qn2a: Column, qn2b: Column): Column =
    dot.cast("double") / sqrt(qn2a.cast("double") * qn2b.cast("double"))

  /** [[int8Dot]] through the codegen'd [[graft.functions.FloatVectorDot]]
    * loop: int8 codes are exact in float32 (|v| ≤ 127 ≪ 2^24), per-term
    * products are exact in the double accumulator, and every partial sum
    * stays far below 2^53 — so the result EQUALS int8Dot bit-for-bit
    * while replacing the interpreted zip_with/aggregate lambdas with a
    * generated primitive loop. Requires
    * [[graft.functions.GraftFunctions.register]] on the session (the
    * declarative [[int8Dot]] stays the registration-free form). */
  def int8DotFast(a: Column, b: Column): Column =
    graft.functions.GraftFunctions
      .vecDot(a.cast("array<float>"), b.cast("array<float>")).cast("long")
}
