package graft.recs

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Post-model stages of the cf pipeline — what happens to raw (user, item,
  * prediction) scores after ALS (reference recommend.py:82-133 +
  * discovery.py:17-25): rank and cut per user, translate the dense
  * training ids back to external keys, de-duplicate on the external key,
  * attach the user's own listening history timestamp, and nest for
  * delivery sorted by score.
  *
  * Scale: every stage is keyed by user or by the join key — one window on
  * spark_user_id (same key as ALS output partitioning), equi-joins on the
  * id-mapping dims (broadcast-able: user/recording maps are small relative
  * to the score matrix), and a final user-keyed aggregation.
  */
object Recommend {

  /** Recording discovery (discovery.py:17-25): the last time each user
    * listened to each mapped recording — the `latest_listened_at`
    * enrichment joined into recommendations. One hash aggregation keyed
    * (user_id, recording_mbid). */
  def recordingDiscovery(listens: DataFrame): DataFrame =
    listens
      .filter(col("recording_mbid").isNotNull)
      .groupBy(col("user_id"), col("recording_mbid"))
      .agg(max(col("listened_at")).as("latest_listened_at"))

  /** Raw-score processing (recommend.py:82-118):
    *   1. row_number per spark_user_id by prediction DESC (recording_id
    *      tiebreak added for determinism), keep rank <= limit;
    *   2. join back to external user_id / recording_mbid via the id maps;
    *   3. collapse duplicate mbids with max(score) (several internal ids
    *      can map to one canonical recording);
    *   4. left-join discovery for latest_listened_at (null = never
    *      listened — a genuine discovery).
    *
    * recommendations: (spark_user_id, recording_id, prediction);
    * users: (spark_user_id, user_id);
    * recordings: (recording_id, recording_mbid).
    */
  def process(
      recommendations: DataFrame, users: DataFrame, recordings: DataFrame,
      discovery: DataFrame, limit: Int): DataFrame = {
    val w = Window.partitionBy(col("spark_user_id"))
      .orderBy(col("prediction").desc, col("recording_id"))
    recommendations
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= limit)
      .join(recordings, Seq("recording_id"))
      .join(users, Seq("spark_user_id"))
      .groupBy(col("user_id"), col("recording_mbid"))
      .agg(max(col("prediction")).as("score"))
      .join(discovery, Seq("user_id", "recording_mbid"), "left")
      .select(col("user_id"), col("recording_mbid"), col("score"),
        col("latest_listened_at"))
  }

  /** Delivery nesting (recommend.py:120-133): per user, the processed recs
    * as an array sorted score-DESC via an explicit `array_sort` comparator
    * (the reference's lambda), recording_mbid ASC on ties for determinism,
    * with the timestamp rendered in the reference's ISO format. */
  def nest(processed: DataFrame): DataFrame =
    processed
      .groupBy(col("user_id"))
      .agg(collect_list(struct(col("recording_mbid"), col("score"),
        date_format(col("latest_listened_at"),
          "yyyy-MM-dd'T'HH:mm:ss.SSS'Z'").as("latest_listened_at")))
        .as("xs"))
      .select(col("user_id"),
        array_sort(col("xs"), (l: Column, r: Column) =>
          when(l("score") > r("score"), -1)
            .when(l("score") < r("score"), 1)
            .when(l("recording_mbid") < r("recording_mbid"), -1)
            .when(l("recording_mbid") > r("recording_mbid"), 1)
            .otherwise(0)).as("recs"))
}
