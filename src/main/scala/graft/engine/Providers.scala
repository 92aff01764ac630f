package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Generic top-k-entities-per-user stat (the user/artist.py:18-111 shape,
  * parameterized over the entity key columns so the same provider serves
  * artists/recordings/releases — or event types on the synthetic surrogate).
  *
  * Partial schema: (userCol, entityCols…, listen_count).
  * Final schema: (userCol, total_count, top_entities: array<struct<
  * listen_count, entityCols…>>) — listen_count is deliberately the FIRST
  * struct field: sort_array orders struct-lexicographically, so field order
  * is semantically load-bearing (SURVEY §2.6 O3).
  *
  * Scale: both aggregate and combine are hash aggregations with map-side
  * partial combine; stats shuffles once on userCol for the window — the
  * same key as the aggregation, so AQE can reuse the partitioning.
  */
final case class TopEntityStats(
    userCol: String, entityCols: Seq[String], top: Int = 1000)
  extends StatsProvider {

  override def filterKeys: Seq[String] = Seq(userCol)
  private def keys: Seq[Column] = (userCol +: entityCols).map(col)

  override def aggregate(listens: DataFrame): DataFrame =
    listens.groupBy(keys: _*).agg(count(lit(1)).as("listen_count"))

  override def combine(partials: DataFrame): DataFrame =
    partials.groupBy(keys: _*).agg(sum(col("listen_count")).as("listen_count"))

  override def stats(partial: DataFrame): DataFrame = {
    val w = Window.partitionBy(col(userCol))
      .orderBy(col("listen_count").desc +: entityCols.map(col): _*)
    partial
      .withColumn("rn", row_number().over(w))
      .withColumn("total_count",
        sum(col("listen_count")).over(Window.partitionBy(col(userCol))))
      .filter(col("rn") <= top)
      .groupBy(col(userCol))
      .agg(
        first(col("total_count")).as("total_count"),
        sort_array(
          collect_list(struct(col("listen_count") +: entityCols.map(col): _*)),
          asc = false).as("top_entities"))
  }
}

/** Faithful user-artists stat over real listens: explode_outer keeps
  * unmapped listens (null mbid) — the semantic the reference encodes in
  * user/artist.py:24 — and grouping is case-insensitive on artist name with
  * a deterministic representative name (min, where the reference uses the
  * non-deterministic first()). */
final case class UserArtistStats(top: Int = 1000) extends StatsProvider {
  override def filterKeys: Seq[String] = Seq("user_id")

  override def aggregate(listens: DataFrame): DataFrame =
    listens
      .select(col("user_id"), col("artist_name"),
        explode_outer(col("artist_credit_mbids")).as("artist_mbid"))
      .groupBy(col("user_id"), lower(col("artist_name")).as("artist_name_key"),
        col("artist_mbid"))
      .agg(min(col("artist_name")).as("artist_name"),
        count(lit(1)).as("listen_count"))

  override def combine(partials: DataFrame): DataFrame =
    partials
      .groupBy(col("user_id"), col("artist_name_key"), col("artist_mbid"))
      .agg(min(col("artist_name")).as("artist_name"),
        sum(col("listen_count")).as("listen_count"))

  override def stats(partial: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("listen_count").desc, col("artist_name_key"),
        col("artist_mbid"))
    partial
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= top)
      .groupBy(col("user_id"))
      .agg(sort_array(collect_list(struct(
        col("listen_count"), col("artist_name"), col("artist_mbid"))),
        asc = false).as("artists"))
  }
}

/** Sitewide top entities with the per-user contribution cap — LEAST(count,
  * cap) — that stops one user's bot traffic from dominating global charts
  * (reference sitewide/entity.py:50-59, cap=500). Two-level aggregation:
  * level 1 shuffles on (user, entity), level 2 on entity alone. */
final case class SitewideEntityStats(
    userCol: String, entityCols: Seq[String],
    perUserCap: Int = 500, top: Int = 1000)
  extends StatsProvider {

  override def filterKeys: Seq[String] = entityCols
  private def keys: Seq[Column] = (userCol +: entityCols).map(col)

  override def aggregate(listens: DataFrame): DataFrame =
    listens.groupBy(keys: _*).agg(count(lit(1)).as("listen_count"))

  override def combine(partials: DataFrame): DataFrame =
    partials.groupBy(keys: _*).agg(sum(col("listen_count")).as("listen_count"))

  override def stats(partial: DataFrame): DataFrame = {
    val w = Window.orderBy(
      col("capped_count").desc +: entityCols.map(col): _*)
    val capped = partial
      .groupBy(entityCols.map(col): _*)
      .agg(sum(least(col("listen_count"), lit(perUserCap.toLong)))
        .as("capped_count"))
    // global top-k over an already-aggregated, entity-cardinality-bounded
    // frame; orderBy+limit plans as TakeOrderedAndProject, not a full sort
    capped.orderBy(col("capped_count").desc +: entityCols.map(col): _*)
      .limit(top)
      .withColumn("rank", row_number().over(w))
  }
}

/** Artist-evolution activity (user/artist_evolution_activity.py:32-120):
  * per (user, listen-year, artist) counts with the artist exploded from
  * the credit array — LATERAL VIEW explode semantics; unmapped credits
  * (null array) are retained under a null artist_mbid, which is why the
  * downstream combine groups null-safely (Spark's groupBy treats nulls as
  * a regular key, matching the reference's manual OR-IS-NULL join). */
final case class ArtistEvolutionStats() extends StatsProvider {
  override def filterKeys: Seq[String] = Seq("user_id")

  override def aggregate(listens: DataFrame): DataFrame =
    listens
      .select(col("user_id"), year(col("listened_at")).as("year"),
        col("artist_name"),
        explode_outer(col("artist_credit_mbids")).as("artist_mbid"))
      .groupBy(col("user_id"), col("year"),
        lower(col("artist_name")).as("artist_name_key"), col("artist_mbid"))
      .agg(min(col("artist_name")).as("artist_name"),
        count(lit(1)).as("listen_count"))

  override def combine(partials: DataFrame): DataFrame =
    partials
      .groupBy(col("user_id"), col("year"), col("artist_name_key"),
        col("artist_mbid"))
      .agg(min(col("artist_name")).as("artist_name"),
        sum(col("listen_count")).as("listen_count"))

  override def stats(partial: DataFrame): DataFrame = partial
}

/** Day-of-week × hour activity grid (user/daily_activity.py:36-46). */
final case class DailyActivityStats(userCol: String, tsCol: String)
  extends StatsProvider {
  override def filterKeys: Seq[String] = Seq(userCol)

  override def aggregate(listens: DataFrame): DataFrame =
    listens.groupBy(col(userCol),
      date_format(col(tsCol), "EEEE").as("day"),
      hour(col(tsCol)).as("hour"))
      .agg(count(lit(1)).as("listen_count"))

  override def combine(partials: DataFrame): DataFrame =
    partials.groupBy(col(userCol), col("day"), col("hour"))
      .agg(sum(col("listen_count")).as("listen_count"))

  override def stats(partial: DataFrame): DataFrame = partial
}

/** Per-entity top listeners (the listener-stats family,
  * stats/incremental/listener/entity.py): inverse grouping of TopEntityStats with
  * exact distinct listener counts. */
final case class ListenerStats(
    userCol: String, entityCols: Seq[String], top: Int = 10)
  extends StatsProvider {
  override def filterKeys: Seq[String] = entityCols

  override def aggregate(listens: DataFrame): DataFrame =
    listens.groupBy((entityCols :+ userCol).map(col): _*)
      .agg(count(lit(1)).as("listen_count"))

  override def combine(partials: DataFrame): DataFrame =
    partials.groupBy((entityCols :+ userCol).map(col): _*)
      .agg(sum(col("listen_count")).as("listen_count"))

  override def stats(partial: DataFrame): DataFrame = {
    val w = Window.partitionBy(entityCols.map(col): _*)
      .orderBy(col("listen_count").desc, col(userCol))
    partial
      .withColumn("rn", row_number().over(w))
      .withColumn("total_listen_count",
        sum(col("listen_count")).over(
          Window.partitionBy(entityCols.map(col): _*)))
      .withColumn("listener_count",
        count(lit(1)).over(Window.partitionBy(entityCols.map(col): _*)))
      .filter(col("rn") <= top)
      .groupBy(entityCols.map(col): _*)
      .agg(
        first(col("total_listen_count")).as("total_listen_count"),
        first(col("listener_count")).as("listener_count"),
        sort_array(collect_list(struct(col("listen_count"), col(userCol))),
          asc = false).as("top_listeners"))
  }
}
