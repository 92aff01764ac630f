package graft

import org.apache.spark.sql.SparkSession

/** Library entry point: a session builder pre-wired with the defaults
  * every graft deployment wants, so `GraftSession.builder().master(...)
  * .getOrCreate()` is the one-liner path to a correctly configured
  * session.
  *
  *   - AQE on, with skew-join splitting and partition coalescing — the
  *     runtime re-plan layer the engine's static shapes assume
  *     (SCALE.md: "AQE handles join skew").
  *   - UTC session timezone — the timezone discipline the reference
  *     lacks and this engine pins everywhere (SURVEY §7.4).
  *   - shuffle parallelism sized to the given core count rather than
  *     Spark's default 200 — on a real cluster pass executors × cores.
  *   - the graft Catalyst expressions injected, so `graft_vec_dot` /
  *     `graft_poly_hash62` resolve in plain SQL.
  *
  * Every setting remains overridable with further `.config(...)` calls.
  */
object GraftSession {

  def builder(
      cores: Int = Runtime.getRuntime.availableProcessors()): SparkSession.Builder =
    SparkSession.builder()
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .withExtensions(new graft.functions.GraftExtensions)
}
