package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact classifier-calibration evaluation — the reliability table,
  * Brier score, and expected calibration error (ECE), all in the
  * engine's ratio-of-integers discipline.
  *
  * Completes the evaluation family next to [[Evaluation.aucExact]]:
  * AUC grades RANKING (are positives scored above negatives?);
  * calibration grades PROBABILITY (when the model says 0.7, does it
  * happen 70% of the time?). A recommender that feeds its scores into
  * downstream thresholds (the reference's recommendation post-filters,
  * recommend.py) needs both.
  *
  * Exactness: predicted probabilities enter as integer PERMILLE
  * (0..1000 — snap doubles with `round(p*1000)` first, the q235
  * score-cents discipline). Then every statistic is integer until one
  * final IEEE division that replays bit-identically anywhere:
  *  - per-bin confidence  = ssum / (1000·n)        (two bigints)
  *  - per-bin accuracy    = pos / n                (two bigints)
  *  - per-bin |gap| numerator = |1000·pos − ssum|  (a bigint — the
  *    common-denominator form of |acc − conf|·n·1000)
  *  - ECE   = Σ_b |1000·pos_b − ssum_b| / (1000·N)
  *  - Brier = Σ (p − 1000·y)² / (10⁶·N)
  * Float summation order — the thing that breaks cross-engine
  * reproducibility for naive mean((p−y)²) — never appears: all sums
  * are bigint sums.
  *
  * Scale shape (100 TB of scored examples): `reliability` is ONE
  * map-side-combinable hash aggregate whose shuffle carries B rows
  * (B ≈ 10-100 bins), `summary` is the same aggregate reduced to one
  * row — no sort, no window, no join. Compare sklearn-style
  * calibration_curve, which sorts the corpus; binning is the
  * aggregation key here, so the corpus is never ordered.
  */
object Calibration {

  /** Equal-width reliability bins over [0, 1000] permille.
    * Returns one row per non-empty bin:
    * `(bin, n, pos, score_sum, accuracy, confidence, gap_num)` where
    * `gap_num = |1000·pos − score_sum|` (the exact ECE contribution
    * numerator; divide by 1000·N for the bin's ECE share).
    *
    * @param df          scored examples
    * @param scoreMille  integer predicted probability in permille
    *                    (0..1000); values are clamped into range
    * @param label       0/1 integer outcome column
    * @param bins        number of equal-width bins (p = 1000 lands in
    *                    the last bin, the standard right-closed edge)
    */
  def reliability(
      df: DataFrame, scoreMille: Column, label: Column,
      bins: Int = 10): DataFrame = {
    require(bins >= 2 && bins <= 1000, s"bins must be in [2,1000], got $bins")
    binned(df, scoreMille, label, bins)
      .groupBy(col("bin"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("y")).as("pos"),
        sum(col("p")).as("score_sum"))
      .select(
        col("bin"), col("n"), col("pos"), col("score_sum"),
        (col("pos") / col("n")).as("accuracy"),
        (col("score_sum") / (col("n") * lit(1000L))).as("confidence"),
        abs(lit(1000L) * col("pos") - col("score_sum")).as("gap_num"))
  }

  /** One-row exact calibration summary:
    * `(n, brier_num, brier_den, brier, ece_num, ece_den, ece)` with
    * `brier = Σ(p − 1000y)² / (10⁶·N)` and
    * `ece = Σ_b |1000·pos_b − ssum_b| / (1000·N)`. Both numerators
    * and denominators are bigints; the quotients are single IEEE
    * divisions. */
  def summary(
      df: DataFrame, scoreMille: Column, label: Column,
      bins: Int = 10): DataFrame = {
    require(bins >= 2 && bins <= 1000, s"bins must be in [2,1000], got $bins")
    val perBin = binned(df, scoreMille, label, bins)
      .groupBy(col("bin"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("y")).as("pos"),
        sum(col("p")).as("ssum"),
        sum((col("p") - lit(1000L) * col("y"))
          * (col("p") - lit(1000L) * col("y"))).as("sq"))
    perBin
      .agg(
        sum(col("n")).as("n"),
        sum(col("sq")).as("brier_num"),
        sum(abs(lit(1000L) * col("pos") - col("ssum"))).as("ece_num"))
      .select(
        col("n"), col("brier_num"),
        (col("n") * lit(1000000L)).as("brier_den"),
        (col("brier_num") / (col("n") * lit(1000000L))).as("brier"),
        col("ece_num"), (col("n") * lit(1000L)).as("ece_den"),
        (col("ece_num") / (col("n") * lit(1000L))).as("ece"))
  }

  /** (p, y, bin) rows: permille clamped to [0,1000], equal-width
    * integer binning `min((p·bins) div 1000, bins−1)`. */
  private def binned(
      df: DataFrame, scoreMille: Column, label: Column,
      bins: Int): DataFrame =
    df.select(
        greatest(least(scoreMille.cast("long"), lit(1000L)), lit(0L))
          .as("p"),
        label.cast("long").as("y"))
      .withColumn("bin",
        least(expr(s"(p * $bins) div 1000"), lit(bins - 1L)))
}
