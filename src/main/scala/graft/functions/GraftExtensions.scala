package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Session-extensions injector: makes the graft custom expressions
  * available to ANY session built with
  * `spark.sql.extensions=graft.functions.GraftExtensions` (or
  * `builder.withExtensions(new GraftExtensions)`), so library users get
  * `graft_vec_dot` / `graft_poly_hash62` in plain `spark.sql(...)` without
  * calling [[GraftFunctions.register]] first — the standard deployment
  * path for a Spark library shipping Catalyst expressions (the same
  * mechanism Delta/Iceberg use). Functions injected here are resolved by
  * the analyzer like built-ins; [[GraftFunctions.register]] stays as the
  * per-session fallback for sessions created without the config.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def withArity(name: String, n: Int)(
      build: Seq[Expression] => Expression): Seq[Expression] => Expression =
    exprs => {
      if (exprs.length != n)
        throw new IllegalArgumentException(
          s"$name expects $n argument${if (n == 1) "" else "s"}, " +
            s"got ${exprs.length}")
      build(exprs)
    }

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("graft_vec_dot"),
      new ExpressionInfo(classOf[FloatVectorDot].getName, "graft_vec_dot"),
      withArity("graft_vec_dot", 2)(e => FloatVectorDot(e(0), e(1)))))
    ext.injectFunction((
      FunctionIdentifier("graft_poly_hash62"),
      new ExpressionInfo(classOf[StringPolyHash62].getName, "graft_poly_hash62"),
      withArity("graft_poly_hash62", 1)(e => StringPolyHash62(e(0)))))
    ext.injectFunction((
      FunctionIdentifier("graft_int8_quantize"),
      new ExpressionInfo(
        classOf[Int8QuantizeCodes].getName, "graft_int8_quantize"),
      withArity("graft_int8_quantize", 1)(e => Int8QuantizeCodes(e(0)))))
    ext.injectFunction((
      FunctionIdentifier("graft_bloom_contains"),
      new ExpressionInfo(
        classOf[LongBloomMightContain].getName, "graft_bloom_contains"),
      withArity("graft_bloom_contains", 2)(e =>
        LongBloomMightContain(e(0), e(1)))))
    // aggregate functions registered this way are wrapped in an
    // AggregateExpression by the analyzer, exactly like built-ins
    ext.injectFunction((
      FunctionIdentifier("graft_heavy_hitters"),
      new ExpressionInfo(
        classOf[MisraGriesAgg].getName, "graft_heavy_hitters"),
      withArity("graft_heavy_hitters", 2)(e => MisraGriesAgg(e(0), e(1)))))
    ext.injectFunction((
      FunctionIdentifier("graft_top_k"),
      new ExpressionInfo(classOf[BoundedTopKAgg].getName, "graft_top_k"),
      withArity("graft_top_k", 3)(e =>
        BoundedTopKAgg(e(0), e(1), e(2), smallest = false))))
    ext.injectFunction((
      FunctionIdentifier("graft_bottom_k"),
      new ExpressionInfo(classOf[BoundedTopKAgg].getName, "graft_bottom_k"),
      withArity("graft_bottom_k", 3)(e =>
        BoundedTopKAgg(e(0), e(1), e(2), smallest = true))))
    // evaluation-strategy rewrite, not a semantic change — see the rule's
    // scaladoc for the exact predicate forms it covers
    ext.injectOptimizerRule(_ => LevenshteinRewrite)
  }
}
