package graft.tags

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Tags dataset (reference tags/tags.py:19-33): for each tag, rank the
  * recordings carrying it by global popularity (dense_rank over
  * COALESCE(total_listen_count, 0) DESC), convert the rank to a percentile
  * in [0, 1], and regroup per recording as a nested (tag, tag_count,
  * percentile) list. The reference runs the same query for recording,
  * artist and release-group tag sources; [[dataset]] is that parameterized
  * query, [[datasetPpm]] the cross-engine-deterministic variant used by the
  * oracled surface.
  *
  * Scale: one window per tag (tag cardinality is modest, recordings per tag
  * can be millions — dense_rank over a single tag partition is a sort per
  * tag, which Spark distributes by partition key), a broadcast-able
  * popularity join only when the popularity side is small (it is keyed by
  * recording, so at 100 TB it is NOT broadcast — plain sort-merge on the
  * equi-key), and one final hash aggregation keyed by recording.
  */
object Tags {

  /** Percentile ranking per tag: `(rank-1) / (max_rank-1)`, defined as 1
    * when the tag has a single rank (the reference's COALESCE(…, 1) —
    * 0-distance division yields NULL via NULLIF instead of an ANSI
    * divide-by-zero).
    *
    * @param tags       (recording_mbid, tag, tag_count)
    * @param popularity (recording_mbid, total_listen_count)
    */
  def dataset(tags: DataFrame, popularity: DataFrame): DataFrame = {
    val ranked = withPercent(tags, popularity)
    ranked
      .groupBy(col("recording_mbid"))
      .agg(sort_array(collect_list(
        struct(col("tag"), col("tag_count"), col("percent"))))
        .as("tags"))
  }

  /** The ranking stage shared by [[dataset]] and [[datasetPpm]]:
    * (recording_mbid, tag, tag_count, percent: double). */
  def withPercent(tags: DataFrame, popularity: DataFrame): DataFrame = {
    val byTag = Window.partitionBy(col("tag"))
      .orderBy(coalesce(col("total_listen_count"), lit(0L)).desc)
    tags
      .join(popularity, Seq("recording_mbid"), "left")
      .withColumn("ranking", dense_rank().over(byTag))
      .withColumn("max_ranking",
        max(col("ranking")).over(Window.partitionBy(col("tag"))))
      .withColumn("percent",
        coalesce((col("ranking") - 1) /
          nullif(col("max_ranking") - 1, lit(0L)), lit(1.0)))
      .select(col("recording_mbid"), col("tag"), col("tag_count"),
        col("percent"))
  }

  /** [[dataset]] with the percentile snapped to parts-per-million (bigint)
    * so nested output flattens to a string that hashes identically across
    * engines. */
  def datasetPpm(tags: DataFrame, popularity: DataFrame): DataFrame =
    withPercent(tags, popularity)
      .withColumn("percent_ppm",
        round(col("percent") * 1000000.0).cast("long"))
      .groupBy(col("recording_mbid"))
      .agg(sort_array(collect_list(
        struct(col("tag"), col("tag_count"), col("percent_ppm"))))
        .as("tags"))
}
