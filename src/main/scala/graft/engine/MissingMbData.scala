package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Missing-MusicBrainz-data dataset (reference
  * listenbrainz_spark/missing_mb_data/missing_mb_data.py:38-43): each
  * user's most-listened UNMAPPED listens — rows with no recording_mbid —
  * ranked so editors can prioritize mapping work. The null-mbid filter is
  * pushed to the scan; everything else is the standard top-k-per-user
  * shape. */
object MissingMbData {

  def apply(listens: DataFrame, top: Int = 200): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("listen_count").desc, col("recording_name"),
        col("artist_name"))
    listens
      .filter(col("recording_mbid").isNull)
      .groupBy(col("user_id"), col("recording_name"), col("artist_name"),
        col("release_name"))
      .agg(count(lit(1)).as("listen_count"),
        max(col("listened_at")).as("last_listened_at"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= top)
  }
}
