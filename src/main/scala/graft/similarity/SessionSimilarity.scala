package graft.similarity

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Session-based entity co-occurrence similarity — the algorithm behind the
  * reference's recording/artist similarity (similarity/recording/common.py:
  * 79-171, similarity/artist.py:28-78), re-expressed as one declarative
  * DataFrame pipeline:
  *
  *   1. sessionize: a user's listens ordered by time; gap > `gapSeconds`
  *      starts a new session (running count-if over a window — W6).
  *   2. per (user, session): distinct entities.
  *   3. pair generation: self-join within the session with id_a < id_b
  *      (J7) — pairs are per-session, never global, so the blowup is
  *      bounded by session length, not user history.
  *   4. per-user cap: a single user contributes at most `perUserCap` to any
  *      pair (LEAST — the anti-abuse semantic of common.py:128).
  *   5. global score = sum of capped contributions; threshold + top-k.
  *
  * Scale: one shuffle on user for the session window, one on (user,
  * session) for pair generation (same key prefix — Catalyst reuses the
  * partitioning), one on the pair for the final score. The reference
  * processes its 27B-listen MLHD dataset chunk-wise with this exact
  * two-stage partial/combine shape; here the partial aggregate per user is
  * the natural chunk boundary.
  */
object SessionSimilarity {

  def apply(
      listens: DataFrame,
      userCol: String, tsCol: String, entityCol: String,
      gapSeconds: Long,
      perUserCap: Long,
      minScore: Long,
      topK: Int): DataFrame = {
    val wOrd = Window.partitionBy(col(userCol)).orderBy(col(tsCol))
    val wRun = wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val sessions = listens
      .withColumn("us", unix_micros(col(tsCol)))
      .withColumn("new_sess",
        when(col("us") - lag(col("us"), 1).over(wOrd) >
          gapSeconds * 1000000L, 1).otherwise(0))
      .withColumn("session_id", sum(col("new_sess")).over(wRun))
      .select(col(userCol).as("u"), col("session_id"), col(entityCol).as("e"))
      .distinct()

    val a = sessions.alias("a")
    val b = sessions.alias("b")
    val perUser = a.join(b,
        col("a.u") === col("b.u") &&
        col("a.session_id") === col("b.session_id") &&
        col("a.e") < col("b.e"))
      .groupBy(col("a.u").as("u"), col("a.e").as("e_a"), col("b.e").as("e_b"))
      .agg(least(count(lit(1)), lit(perUserCap)).as("contrib"))

    // ENGINE INVARIANT: a global (unpartitioned) window is legal ONLY
    // after a cardinality bound — here the orderBy+limit(topK) has already
    // collapsed the frame to <= topK rows, so the single-partition
    // WindowExec ranks a bounded result, never the pair space
    val w = Window.orderBy(col("score").desc, col("e_a"), col("e_b"))
    perUser
      .groupBy(col("e_a"), col("e_b"))
      .agg(sum(col("contrib")).as("score"))
      .filter(col("score") >= minScore)
      .orderBy(col("score").desc, col("e_a"), col("e_b"))
      .limit(topK)
      .withColumn("rank", row_number().over(w))
  }
}
