package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact distributed ranking-model evaluation — ROC-AUC via the
  * Mann–Whitney U statistic, computed from per-score aggregates and a
  * distributed prefix sum instead of a global sort of the scored rows.
  *
  * AUC with ties (the standard mid-rank convention): assign every row
  * the AVERAGE rank of its score group; then
  * `U = Σ ranks(positives) − P(P+1)/2` and `AUC = U / (P·N_neg)`.
  * Everything here is exact integer arithmetic scaled by 2 (average
  * ranks are half-integers): per distinct score s with n_s rows, p_s
  * positive, and `less_s` rows strictly below,
  * `2·Σranks_pos = Σ p_s · (2·less_s + n_s + 1)`, so
  * `auc_num = Σ p_s (2 less_s + n_s + 1) − P(P+1)` and
  * `auc_den = 2·P·(N−P)` — two bigints whose ratio IS the AUC, the
  * engine's ratio-of-integers discipline (one IEEE division at the
  * end is bit-identical across engines).
  *
  * Scale shape (100 TB of scored examples): the corpus pass is ONE
  * hash aggregate `groupBy(score)` (map-side combinable — the shuffle
  * carries distinct scores, not rows); `less_s` comes from
  * [[PrefixSum.runningTotal]]'s range-exchange prefix sum over the
  * per-score frame, so no single-partition `Window.orderBy` ever
  * plans. Compare the textbook formulation — global sort + one
  * sequential rank scan — which is exactly the scale cliff PrefixSum
  * exists to remove. Reference analogue: model evaluation over the
  * recommender's scored candidates (recommend.py post-scoring), which
  * the reference does driver-side at sample scale.
  */
object Evaluation {

  /** One-row frame: `auc_num`, `auc_den` (bigint, AUC = num/den with
    * mid-rank tie handling), `auc` (the IEEE quotient), plus the
    * supporting exact counts `n_pos`, `n_neg`.
    *
    * @param df     scored examples
    * @param score  integer score column (snap doubles to cents first —
    *               exactness needs a discrete total order)
    * @param label  0/1 integer label column
    */
  def aucExact(df: DataFrame, score: Column, label: Column): DataFrame = {
    val perScore = df
      .select(score.cast("long").as("s"), label.cast("long").as("y"))
      .groupBy(col("s"))
      .agg(count(lit(1)).as("n"), sum(col("y")).as("p"))
    val cum = PrefixSum.runningTotal(
      perScore, Seq(col("s")), col("n"), out = "cum")
    cum
      .select(
        (col("p") * (lit(2) * (col("cum") - col("n")) + col("n") + lit(1)))
          .as("term"),
        col("p"), col("n"))
      .agg(sum(col("term")).as("rank2"), sum(col("p")).as("pos"),
        sum(col("n")).as("tot"))
      .select(
        (col("rank2") - col("pos") * (col("pos") + lit(1))).as("auc_num"),
        (lit(2) * col("pos") * (col("tot") - col("pos"))).as("auc_den"),
        col("pos").as("n_pos"), (col("tot") - col("pos")).as("n_neg"))
      .withColumn("auc", col("auc_num") / col("auc_den"))
  }
}
