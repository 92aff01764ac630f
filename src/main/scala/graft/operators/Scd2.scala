package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-Changing-Dimension Type 2 history build — collapse an event
  * log into per-key validity intervals: one row per (key, state) RUN
  * with `[valid_from, valid_to)` bounds, a per-key version number, and
  * an `is_current` flag on the open interval. This is the standard
  * warehouse dimension-history operator (and, for a training-data
  * pipeline, the "state of the user AT example time" table that
  * point-in-time-correct feature joins — [[AsOfJoin]] — consume; the
  * reference keeps only latest-state rows, e.g. its user table upserts
  * in the listenbrainz_spark postgres modules, so the full history is
  * beyond-parity surface).
  *
  * Semantics: events are ordered per key by `(tsCol, tieCol)` (the tie
  * column makes equal-timestamp runs deterministic); consecutive rows
  * with an UNCHANGED state are compressed into the run's first row;
  * `valid_from` = the run's first event time, `valid_to` = the next
  * run's `valid_from` (NULL on the latest run ⇒ `is_current`),
  * `version` counts runs per key from 1. A state changing A→B→A yields
  * three intervals — runs, not distinct values. NULL states are a
  * legal run value (null-safe change detection via the `<=>` dual).
  *
  * Scale shape (100 TB): ONE shuffle on the dimension key. Both
  * windows (change detection, then interval stitching) share the same
  * `partitionBy(key) orderBy(ts, tie)` sort — Spark plans one Sort +
  * two WindowExecs, and the second window runs over the CHANGE rows
  * only (bounded by distinct runs, typically ≪ events). No self-join:
  * the textbook `lead`-stitch replaces the events×events interval
  * join. Key skew = one power-user's history on one task; histories
  * are years × state-changes (thousands of rows), far under any
  * executor's memory, so no salting is needed.
  */
object Scd2 {

  /** Build the interval history:
    * `(keyCol, stateCol, valid_from, valid_to, version, is_current)`.
    *
    * @param tieCol breaks equal-`tsCol` ties deterministically (a
    *               unique event id). Runs are detected and stitched in
    *               `(tsCol, tieCol)` order.
    */
  def history(
      events: DataFrame, keyCol: String, stateCol: String,
      tsCol: String, tieCol: String): DataFrame = {
    val cols = Seq(keyCol, stateCol, tsCol, tieCol)
    require(cols.distinct.size == cols.size, s"column collision: $cols")
    val order = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol), col(tieCol))
    val changed = events
      .withColumn("__graft_prev", lag(col(stateCol), 1).over(order))
      .withColumn("__graft_first",
        row_number().over(order) === 1)
      // null-safe: a NULL state following a NULL state is the same run
      .filter(col("__graft_first") ||
        !(col(stateCol) <=> col("__graft_prev")))
    changed
      .withColumn("valid_from", col(tsCol))
      .withColumn("valid_to", lead(col(tsCol), 1).over(order))
      .withColumn("version", row_number().over(order).cast("long"))
      .withColumn("is_current", col("valid_to").isNull)
      .select(col(keyCol), col(stateCol), col("valid_from"),
        col("valid_to"), col("version"), col("is_current"))
  }

  /** The latest-state rows only — what a Type-1 upsert dimension (the
    * reference's shape) would hold; derived from the same single-sort
    * plan. */
  def current(
      events: DataFrame, keyCol: String, stateCol: String,
      tsCol: String, tieCol: String): DataFrame =
    history(events, keyCol, stateCol, tsCol, tieCol)
      .filter(col("is_current"))
      .select(col(keyCol), col(stateCol),
        col("valid_from").as("since"), col("version"))

  /** Point-in-time lookup: the state of every key at `at` (keys whose
    * first interval opens after `at` are absent). A closed interval
    * matches `valid_from <= at < valid_to`; the open interval matches
    * `valid_from <= at`. */
  def stateAt(historyDf: DataFrame, at: Column): DataFrame =
    historyDf.filter(col("valid_from") <= at &&
      (col("valid_to").isNull || at < col("valid_to")))

  /** Incremental history maintenance: a new event batch arrives and
    * ONLY the touched keys' histories rebuild — from the immutable log
    * restricted to those keys — while every untouched key's rows pass
    * through from the existing history untouched. Row-identical to
    * `history(priorEvents ∪ batch)`: versions and interval stitching
    * are per-key, so rebuilding a key from its full event set
    * reproduces exactly what the full recompute would emit (late and
    * out-of-order events included — this is why the rebuild reads the
    * log, not the collapsed history). Per batch the cost is the batch's
    * key set (semi join against history AND log) plus a history pass
    * over touched keys only — the [[graft.dedup.MinHash]]
    * incremental-index economics for dimension maintenance.
    *
    * No broadcast hint on the touched-key set: the normal daily batch is
    * small and AQE broadcasts it from runtime stats, but a backfill or
    * replay batch can touch most keys — an unconditional hint there is
    * an over-driver-memory broadcast, while the planner's choice
    * degrades gracefully to a shuffled semi/anti join with identical
    * semantics.
    */
  def merge(
      historyDf: DataFrame, priorEvents: DataFrame, batch: DataFrame,
      keyCol: String, stateCol: String,
      tsCol: String, tieCol: String): DataFrame = {
    val touched = batch.select(col(keyCol)).distinct()
    val untouched = historyDf.join(touched, Seq(keyCol), "left_anti")
    val rebuilt = history(
      priorEvents.unionByName(batch)
        .join(touched, Seq(keyCol), "left_semi"),
      keyCol, stateCol, tsCol, tieCol)
    untouched.unionByName(rebuilt)
  }
}
