package graft.core

import org.apache.spark.sql.SparkSession

/** Scoped session-conf overrides for operators that must size their
  * OWN parallelism from measured data volume instead of inheriting the
  * session's `spark.sql.shuffle.partitions` (a fixed session width is
  * the per-task memory cliff: a 30M-row sort-merge join at width 4 is
  * a 7.5M-row sort frame per task — the q229 OOM at the 4 GiB
  * production share).
  *
  * Scoping is sound when the body ENDS IN AN ACTION (the engine's
  * per-round [[Pin]] is one): exchanges take their width at plan time,
  * the eager localCheckpoint materializes under the override, and the
  * restored conf cannot re-plan what is already checkpointed. Same
  * discipline as the events-read legacy flag (core/Tables.scala) —
  * scope the override to the operation that needs it, never the
  * session.
  */
object ScopedConf {

  /** Run `body` with `spark.sql.shuffle.partitions` temporarily set to
    * `n`, restoring the previous value afterwards. */
  def withShufflePartitions[T](spark: SparkSession, n: Int)(body: => T): T = {
    val key = "spark.sql.shuffle.partitions"
    val prev = spark.conf.get(key)
    spark.conf.set(key, n.toString)
    try body finally spark.conf.set(key, prev)
  }
}
