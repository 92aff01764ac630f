package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic Poisson bootstrap — distributed confidence intervals
  * for a mean without ever resampling rows. The classic bootstrap
  * draws n rows with replacement per replica: a shuffle per replica,
  * unusable at corpus scale. The Poisson bootstrap (Chamandy et al.,
  * "Estimating Uncertainty for Massive Data Streams", Google 2012)
  * replaces each replica's multinomial resample with an independent
  * Poisson(1) weight PER ROW — so ALL replicas ride one corpus scan:
  * this aggregate computes `Σ w_b·x` and `Σ w_b` for every replica b
  * as 2·B map-side-combinable sum columns, then unpivots the single
  * result row into B (replica, n_eff, sum, mean) rows. Nothing but
  * one row of 2·B longs crosses the wire after partial aggregation.
  *
  * Determinism: the Poisson draw never touches floats. The uniform is
  * the engine's md5-hex discipline (8 hex chars of
  * `md5(key ":bs" (b div 4) ":" salt)` — one digest carries four
  * replicas' uniforms), and the inverse-CDF thresholds are
  * PRECOMPUTED 8-hex-char constants (Poisson(1) CDF × 2³², floored —
  * the values below); weight = index of the first threshold above the
  * uniform, capped at 7 (P ≈ 8·10⁻⁵). Fixed-width lowercase hex
  * compares lexicographically as the numbers do (the q242 recipe), so
  * every weight replays bit-identically in any engine with md5.
  *
  * Values enter as integer cents (q235 discipline): replica sums are
  * exact bigints; each replica mean is one IEEE division.
  */
object Bootstrap {

  /** Poisson(1) CDF thresholds scaled to 8 hex chars:
    * P(W ≤ k) · 2³² for k = 0..6. */
  private[operators] val CdfHex = Seq(
    "5e2d58d8", "bc5ab1b1", "eb715e1d", "fb239797",
    "ff1025f5", "ffd90f3b", "fffa8b71")

  /** The Poisson(1) weight of `key` in replica `b` (0-based) as a
    * Column — exposed for oracles/specs. One md5 digest is 32 hex
    * chars = FOUR independent 8-char uniforms, so replicas 4g..4g+3
    * share the digest of `key ":bs" g ":" salt` — a 4× cut in the
    * dominant per-row cost (the digest), with the draw discipline
    * unchanged. */
  private[operators] def weight(key: Column, b: Int, salt: String): Column = {
    val u = substring(
      md5(concat(key.cast("string"), lit(s":bs${b / 4}:$salt"))
        .cast("binary")),
      1 + 8 * (b % 4), 8)
    CdfHex.zipWithIndex.foldRight(lit(7L): Column) {
      case ((hex, k), acc) => when(u < lit(hex), k.toLong).otherwise(acc)
    }
  }

  /** B bootstrap replicas of the mean of `valueCents`:
    * `(replica, n_eff, sum_cents, mean_cents)` rows, replica 0..B−1.
    * Percentile CIs are the caller's cut over the B means (B is
    * config-sized — 16..256; the frame is B rows).
    *
    * @param key        unique, stable row identity driving the draws
    * @param valueCents exact integer value column
    */
  def poissonMeans(
      df: DataFrame, key: Column, valueCents: Column,
      replicas: Int = 32, salt: String = "g"): DataFrame =
    meansWith(df, key, valueCents, replicas, salt, weight)

  /** The same CDF thresholds as unsigned 32-bit longs — the FAST
    * family compares integers, not hex strings. */
  private[operators] val CdfLong: Seq[Long] =
    CdfHex.map(java.lang.Long.parseLong(_, 16))

  /** PRODUCTION-family weight: one codegen'd `xxhash64` per TWO
    * replicas (the 64-bit hash is two independent 32-bit uniforms —
    * replicas 2g/2g+1 take the high/low word of
    * `xxhash64(key ":bs" g ":" salt)`), thresholds as integer
    * constants — no digest, no hex detour, the [[CountMin]]
    * fast-family precedent. NOT replayable in DuckDB; q268 pins its
    * statistical envelope instead (the q218 recipe), and the spec
    * pins the draw against an independent JVM xxhash64. */
  private[operators] def weightFast(
      key: Column, b: Int, salt: String): Column = {
    val h = xxhash64(concat(key.cast("string"), lit(s":bs${b / 2}:$salt")))
    val u =
      if (b % 2 == 0) shiftrightunsigned(h, 32)
      else h.bitwiseAND(lit(0xFFFFFFFFL))
    CdfLong.zipWithIndex.foldRight(lit(7L): Column) {
      case ((th, k), acc) => when(u < lit(th), k.toLong).otherwise(acc)
    }
  }

  /** [[poissonMeans]] drawing with the [[weightFast]] xxhash64 family
    * — same output shape, measured ~5× cheaper per row at 30×
    * (SCALE.md). */
  def poissonMeansFast(
      df: DataFrame, key: Column, valueCents: Column,
      replicas: Int = 32, salt: String = "g"): DataFrame =
    meansWith(df, key, valueCents, replicas, salt, weightFast)

  private def meansWith(
      df: DataFrame, key: Column, valueCents: Column,
      replicas: Int, salt: String,
      w: (Column, Int, String) => Column): DataFrame = {
    require(replicas >= 1 && replicas <= 512,
      s"replicas must be in [1,512], got $replicas")
    val aggs = (0 until replicas).flatMap { b =>
      val wb = w(key, b, salt)
      Seq(
        sum(wb * valueCents.cast("long")).as(s"s$b"),
        sum(wb).as(s"n$b"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    one
      .select(explode(array((0 until replicas).map(b =>
        struct(lit(b.toLong).as("replica"), col(s"s$b").as("sum_cents"),
          col(s"n$b").as("n_eff"))): _*)).as("r"))
      .select(col("r.replica"), col("r.n_eff"), col("r.sum_cents"))
      .withColumn("mean_cents",
        when(col("n_eff") === 0L, lit(null).cast("double"))
          .otherwise(col("sum_cents") / col("n_eff")))
  }
}
