package graft.operators

import org.apache.spark.sql.DataFrame

/** Incremental view maintenance for inner equi-joins — the delta rule
  * that keeps a materialized join current without re-joining history:
  * for inserts ΔR, ΔS,
  * `(R∪ΔR) ⋈ (S∪ΔS) = (R ⋈ S) ∪ ΔR⋈S ∪ R⋈ΔS ∪ ΔR⋈ΔS`
  * — a bag-semantics identity (each pair (r, s) lands in exactly one
  * term by which side(s) are new), so the maintained view is EXACT,
  * not an approximation, and any aggregate over it is too.
  *
  * Scale shape (100 TB base, daily deltas): the three delta terms
  * join DELTA-sized probe sides against the base tables — daily cost
  * O(Δ × match fan-out), never O(|R|·|S|) or a history re-join; AQE
  * broadcasts the delta sides when small. This is the generic-join
  * member of the engine's IVM family (the q230 co-occurrence delta is
  * the self-join case; IncrementalStatsEngine is the aggregate case).
  * Requires the base/delta frames to be DISJOINT partitions of the
  * new state — the caller's contract (an overlapping row would double
  * count, exactly as in every IVM system).
  */
object IncrementalJoin {

  /** The new rows the maintained inner-join view gains from inserts
    * `dr` and `ds`: `ΔR⋈S ∪ R⋈ΔS ∪ ΔR⋈ΔS` (bag union — duplicates
    * are real join multiplicities). */
  def deltaInner(
      r: DataFrame, dr: DataFrame, s: DataFrame, ds: DataFrame,
      on: Seq[String]): DataFrame =
    dr.join(s, on)
      .unionByName(r.join(ds, on))
      .unionByName(dr.join(ds, on))
}
