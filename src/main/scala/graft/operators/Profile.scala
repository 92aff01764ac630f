package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{NumericType, StringType}

/** One-pass dataset profiler — the pre-flight audit before a corpus
  * enters the pipeline: per column, the row count, null count, distinct
  * count, and min/max (numeric columns as doubles, string columns as
  * strings). The operational questions it answers at ingest time — did a
  * source arrive empty, did a column go all-NULL, did an id space
  * collapse — are the ones that otherwise surface three stages later as
  * a silently skewed join.
  *
  * Scale shape (100 TB): ALL columns are profiled in ONE aggregation
  * pass over the data (a single scan, map-side partial aggregation,
  * one single-row result), then exploded into the per-column report —
  * never a scan per column. Exact distinct counts make the multi-column
  * aggregate plan with Expand (one input row fans out per distinct
  * column — the standard multi-distinct shape); `exact = false` swaps in
  * HLL `approx_count_distinct`, which profiles every column in a single
  * Expand-free pass — the default at real scale, where a profile is a
  * health check, not an oracle.
  *
  * Min/max report actual element values (no accumulation), so even the
  * double columns are hash-exact cross-engine.
  */
object Profile {

  /** Profile `cols` (default: every column) of `df`: one row per column,
    * `(col_name, n_rows, n_nulls, n_distinct, min_num, max_num, min_str,
    * max_str)`, ordered by col_name. Non-numeric, non-string columns
    * report NULL min/max but real null/distinct counts. */
  def profile(
      df: DataFrame, cols: Seq[String] = Seq.empty,
      exact: Boolean = true): DataFrame = {
    val names = if (cols.isEmpty) df.columns.toSeq else cols
    val missing = names.filterNot(df.columns.contains)
    require(missing.isEmpty, s"no such column(s): ${missing.mkString(", ")}")
    val types = df.schema.fields.map(f => f.name -> f.dataType).toMap

    val aggs = count(lit(1)).as("__n") +: names.flatMap { c =>
      val nd = if (exact) countDistinct(col(c))
        else approx_count_distinct(col(c))
      val isNum = types(c).isInstanceOf[NumericType]
      val isStr = types(c) == StringType
      Seq(
        count(col(c)).as(s"__nn_$c"),
        nd.as(s"__nd_$c"),
        (if (isNum) min(col(c)).cast("double")
          else lit(null).cast("double")).as(s"__mn_$c"),
        (if (isNum) max(col(c)).cast("double")
          else lit(null).cast("double")).as(s"__mx_$c"),
        (if (isStr) min(col(c)) else lit(null).cast("string"))
          .as(s"__ms_$c"),
        (if (isStr) max(col(c)) else lit(null).cast("string"))
          .as(s"__xs_$c"))
    }

    df.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(names.map(c => struct(
        lit(c).as("col_name"),
        col("__n").as("n_rows"),
        (col("__n") - col(s"__nn_$c")).as("n_nulls"),
        col(s"__nd_$c").as("n_distinct"),
        col(s"__mn_$c").as("min_num"),
        col(s"__mx_$c").as("max_num"),
        col(s"__ms_$c").as("min_str"),
        col(s"__xs_$c").as("max_str"))): _*)).as("__p"))
      .select(col("__p.*"))
      .orderBy(col("col_name"))
  }
}
