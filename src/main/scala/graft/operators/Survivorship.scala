package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Golden-record construction (survivorship): collapse each duplicate
  * cluster to ONE merged record with field-level survivor rules — the
  * step after matching (FuzzyJoin) and clustering (Clusters) in a
  * master-data pipeline, and the record-merge shape behind the
  * reference's canonical metadata tables (artist/release credits merged
  * from multiple submissions, listenbrainz_spark/postgres/artist.py).
  *
  * Rules, all deterministic:
  *   - `modalFields`: most frequent non-null value in the cluster, ties
  *     by value ascending (the exact-mode discipline — never `first()`
  *     on an unordered group);
  *   - `maxFields` / `minFields`: numeric extremes;
  *   - `n_members`: cluster size.
  *
  * Scale shape: the record⋈cluster join is id-keyed; every rule is then
  * a component-keyed aggregation. Modal votes go through one
  * (component, field, value) count — map-side combinable — and a rank
  * window PER FIELD over the vote table (cluster×distinct-values rows,
  * not records). The per-field frames re-join on the component key, so
  * under AQE the join chain stays on one exchange footprint; nothing in
  * the plan touches unaggregated records twice.
  */
object Survivorship {

  /** One golden row per component: (component, n_members, <modal...>,
    * <max...>, <min...>). `clusters` must carry (idCol, component) — the
    * [[graft.dedup.Clusters.assign]] contract. */
  def golden(
      records: DataFrame, idCol: String,
      clusters: DataFrame,
      modalFields: Seq[String],
      maxFields: Seq[String] = Nil,
      minFields: Seq[String] = Nil): DataFrame = {
    require(modalFields.nonEmpty || maxFields.nonEmpty || minFields.nonEmpty,
      "at least one survivor rule is required")
    val joined = records.join(
      clusters.select(col(idCol), col("component")), Seq(idCol))

    val base = joined.groupBy(col("component")).agg(
      count(lit(1)).as("n_members"),
      (maxFields.map(f => max(col(f)).as(f)) ++
        minFields.map(f => min(col(f)).as(f))): _*)

    modalFields.foldLeft(base) { (acc, f) =>
      val w = Window.partitionBy(col("component"))
        .orderBy(col("n_votes").desc, col(f).asc)
      val modal = joined.filter(col(f).isNotNull)
        .groupBy(col("component"), col(f))
        .agg(count(lit(1)).as("n_votes"))
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") === 1)
        .select(col("component"), col(f))
      // left join: a cluster whose field is all-null keeps a null survivor
      acc.join(modal, Seq("component"), "left")
    }
  }
}
