package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Declarative data-quality / referential-integrity audit: a list of
  * named checks, each reduced to ONE exact violation count, unioned into
  * a small report table — the pre-flight gate a warehouse runs before
  * publishing a snapshot (the reference's import pipeline validates
  * dump chunks the same way before marking them imported,
  * listenbrainz_spark/dump/import_dump.py).
  *
  * Every check is a full-relation aggregate that returns ONE row:
  *   - [[fkOrphans]]: child keys absent from the parent — LEFT ANTI join
  *     then count. The anti join shuffles only the child's key column
  *     (project-before-join), and for the un-broadcastable-parent regime
  *     callers can pre-reduce the child with
  *     [[BloomPrune.antiJoinLong]] — same contract, pre-shuffle miss
  *     settlement.
  *   - [[notNull]] / [[inRange]] / [[accepted]]: map-side predicates
  *     under one `sum(when(...))` — no shuffle at all beyond the final
  *     scalar.
  *   - [[unique]]: duplicate excess = rows − distinct keys, one key
  *     aggregate.
  *
  * The report unions #checks single-row frames; Spark runs the branches
  * as independent stages of one job, so the audit's wall-clock is the
  * slowest single check, not the sum.
  */
object Integrity {

  /** Child rows whose non-null `fk` has no match in `parent(pk)`. */
  def fkOrphans(
      name: String, child: DataFrame, fk: String,
      parent: DataFrame, pk: String): DataFrame =
    child.select(col(fk)).filter(col(fk).isNotNull)
      .join(parent.select(col(pk).as("__graft_pk")),
        col(fk) === col("__graft_pk"), "left_anti")
      .agg(count(lit(1)).as("violations"))
      .select(lit(name).as("check"), col("violations"))

  /** Rows where `c` is null. */
  def notNull(name: String, df: DataFrame, c: String): DataFrame =
    df.agg(sum(when(col(c).isNull, 1L).otherwise(0L)).as("violations"))
      .select(lit(name).as("check"),
        coalesce(col("violations"), lit(0L)).as("violations"))

  /** Rows where `c` falls outside [lo, hi] (nulls don't violate). */
  def inRange(
      name: String, df: DataFrame, c: String,
      lo: Double, hi: Double): DataFrame =
    df.agg(sum(when(col(c) < lo || col(c) > hi, 1L).otherwise(0L))
        .as("violations"))
      .select(lit(name).as("check"),
        coalesce(col("violations"), lit(0L)).as("violations"))

  /** Rows whose `c` is not in the accepted value list (nulls violate —
    * an enum column with null is unclassified). */
  def accepted(
      name: String, df: DataFrame, c: String,
      values: Seq[String]): DataFrame =
    df.agg(sum(when(col(c).isin(values: _*), 0L).otherwise(1L))
        .as("violations"))
      .select(lit(name).as("check"),
        coalesce(col("violations"), lit(0L)).as("violations"))

  /** Excess duplicate rows over `keys`: count(*) − count(distinct keys). */
  def unique(name: String, df: DataFrame, keys: Seq[String]): DataFrame = {
    val total = df.agg(count(lit(1)).as("n"))
    val distinctKeys = df.select(keys.map(col): _*).distinct()
      .agg(count(lit(1)).as("d"))
    total.crossJoin(distinctKeys)
      .select(lit(name).as("check"), (col("n") - col("d")).as("violations"))
  }

  /** Union the checks into the audit report, ordered by check name. */
  def report(checks: Seq[DataFrame]): DataFrame = {
    require(checks.nonEmpty, "at least one check is required")
    checks.reduce(_ unionByName _).orderBy(col("check"))
  }
}
