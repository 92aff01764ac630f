package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Leakage-safe deterministic train/val/test splitting: every row is
  * assigned a split by hashing a GROUPING key (source domain, user id,
  * document cluster) rather than the row itself, so all rows sharing the
  * key land in the same split — the guard against train/eval leakage
  * through near-identical rows from one origin (the same reason
  * recommender evaluation splits by user, reference:
  * train_models.py's train/validation/test split of per-user playcounts).
  *
  * Assignment is `md5(key || ':' || salt)` mapped onto 256 hash buckets
  * (the first two hex chars) and cut by range — cross-engine
  * reproducible (identical in any engine with md5, unlike `rand(seed)`),
  * stable under corpus growth (a key's split never changes when other
  * keys arrive — the property that keeps yesterday's eval set valid
  * after today's ingest), and resolution-documented (fractions snap to
  * 1/256). A pure per-row projection: no shuffle, no state — at 100 TB
  * it fuses into whatever scan precedes it.
  */
object DataSplit {

  /** Adds a `split` column ("train" | "val" | "test") keyed on `keyCol`.
    * `trainFrac`/`valFrac` snap to 1/256 resolution; the remainder is
    * test. `valFrac = 0` gives a two-way train/test split. Changing
    * `salt` re-deals every key. NULL keys land in "test" (null
    * propagates through the hash, identical to the `key || ':' || salt`
    * SQL form — never silently hashed as salt-alone). */
  def assign(
      df: DataFrame, keyCol: String, salt: String,
      trainFrac: Double = 0.8, valFrac: Double = 0.1): DataFrame = {
    require(trainFrac > 0 && valFrac >= 0 && trainFrac + valFrac < 1,
      s"invalid fractions: train=$trainFrac val=$valFrac")
    require(!df.columns.contains("split"),
      "input already has a split column — rename it before splitting")
    val cut1 = math.round(256 * trainFrac).toInt
    val cut2 = math.round(256 * (trainFrac + valFrac)).toInt
    require(cut1 >= 1 && cut2 >= cut1 && cut2 < 256,
      s"fractions too small for 1/256 resolution: cuts $cut1/$cut2")
    df.withColumn("split", splitExpr(col(keyCol), salt, cut1, cut2))
  }

  /** The assignment expression itself (for fusing into a wider select):
    * bucket = first byte of md5(key:salt), ranges [0,cut1) train,
    * [cut1,cut2) val, [cut2,256) test. The comparison is lexicographic
    * on the two-hex-char prefix, which equals the numeric byte order.
    * `concat` (not concat_ws) so a NULL key yields a NULL hash and both
    * WHEN branches fall through to "test" — the same result the SQL
    * `||` form produces. */
  def splitExpr(key: Column, salt: String, cut1: Int, cut2: Int): Column = {
    val h = substring(
      md5(concat(key.cast("string"), lit(":" + salt)).cast("binary")), 1, 2)
    when(h < lit(f"$cut1%02x"), "train")
      .when(h < lit(f"$cut2%02x"), "val")
      .otherwise("test")
  }
}
