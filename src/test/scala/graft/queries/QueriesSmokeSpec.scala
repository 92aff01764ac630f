package graft.queries

import graft.SparkSpec

/** Regression net: every registered query must execute at sf0.001 (the
  * driver's smoke scale) without throwing, and the flagship entry must
  * return rows. Correctness is the DuckDB gate's job; this catches
  * plan-breaking regressions (analysis errors, overflow, bad casts) at
  * test time. */
class QueriesSmokeSpec extends SparkSpec {
  private val sfDir = "/root/testdata/sf0.001"

  test("entry returns rows") {
    assert(graft.SparkEntry.entry(spark).count() > 0)
  }

  test("registry names are unique and oracles well-formed") {
    val qs = Registry.all
    assert(qs.map(_.name).distinct.size == qs.size)
    // every oracle mentions at least one known table — except the
    // constant-frame envelope oracles (q218 recipe: the engine-side
    // result is compared against pinned booleans/constants over a
    // generate_series or VALUES frame; q268 and q277 are examples)
    val tables = graft.core.Tables.names.toSet
    qs.flatMap(q => q.oracle.map(q.name -> _)).foreach { case (n, sql) =>
      assert(tables.exists(t => sql.toLowerCase.contains(t)) ||
        sql.toLowerCase.contains("generate_series") ||
        sql.toLowerCase.contains("(values"),
        s"$n oracle references no known table")
    }
  }

  // the heavyweight ML query is exercised in PipelineSpec; skip it here to
  // keep the suite fast
  private val skip = Set("q80_als_recommend")

  Registry.all.filterNot(q => skip(q.name)).foreach { q =>
    test(s"${q.name} executes at sf0.001") {
      val df = q.run(spark, sfDir)
      assert(df.columns.nonEmpty)
      df.write.format("noop").mode("overwrite").save()
    }
  }
}
