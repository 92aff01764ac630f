package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Snapshot-to-snapshot corpus diff — the reproducibility audit between
  * two versions of a dataset: which rows were added, removed, changed,
  * or untouched. Training-data pipelines re-materialize corpora
  * constantly (new crawl, new filter thresholds, re-run dedup); the
  * diff is what turns "the corpus changed" into an actionable,
  * reviewable delta (reference analogue: the incremental listen-store
  * refresh audits its full-vs-incremental reconciliation the same way,
  * engine/ListenStore.scala).
  *
  * Shape: ONE full-outer hash join on the id — the minimum any diff
  * pays — with both sides shuffle-partitioned on the same key, then a
  * per-row CASE. Presence is tracked by explicit marker columns, so a
  * legitimately-NULL content value is never confused with an absent
  * row, and content equality is NULL-SAFE (`<=>`): (null, null) content
  * is unchanged, null→value is changed.
  *
  * `fingerprint = true` is the 100 TB path: both sides exchange an
  * 8-byte `xxhash64` of the content instead of the content itself —
  * the join's shuffle carries (id, hash) regardless of document size,
  * at a 2⁻⁶⁴-per-pair false-"unchanged" risk. `false` compares content
  * exactly (the oracle-able setting); CorpusDiffSpec proves the two
  * agree on a fixture. Pass `struct(cols…)` as `content` to diff
  * multiple columns at once.
  */
object CorpusDiff {

  /** (idCol, status ∈ added|removed|changed|unchanged) for every id in
    * either snapshot. */
  def diff(
      oldDf: DataFrame, newDf: DataFrame, idCol: String,
      content: Column, fingerprint: Boolean = false): DataFrame = {
    val c = if (fingerprint) xxhash64(content) else content
    val o = oldDf.select(col(idCol), c.as("__old_c"),
      lit(true).as("__in_old"))
    val n = newDf.select(col(idCol), c.as("__new_c"),
      lit(true).as("__in_new"))
    o.join(n, Seq(idCol), "full_outer")
      .withColumn("status",
        when(col("__in_old").isNull, "added")
          .when(col("__in_new").isNull, "removed")
          .when(col("__old_c") <=> col("__new_c"), "unchanged")
          .otherwise("changed"))
      .select(col(idCol), col("status"))
  }

  /** Status counts — the one-line audit record for a corpus release. */
  def summary(
      oldDf: DataFrame, newDf: DataFrame, idCol: String,
      content: Column, fingerprint: Boolean = false): DataFrame =
    diff(oldDf, newDf, idCol, content, fingerprint)
      .groupBy(col("status")).agg(count(lit(1)).as("n_rows"))
}
