package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — the time-series operator Spark has no native node for
  * (the builder brief's canonical example): for every left row, the
  * LATEST right row with `right.ts <= left.ts` on the same key.
  *
  * Implementation takes the compose-existing-ops route (preference (a)):
  * tag and union both inputs, run ONE window per key ordered by
  * (ts, side) that carries the last-seen right payload forward, keep the
  * left rows. Cost is one shuffle on the key plus a per-key sort — the
  * sort-merge shape that survives 100 TB. The naive alternatives both
  * die at scale: a ts-range theta join explodes candidates quadratically
  * per key, and a per-row correlated lookup is a driver loop.
  *
  * Semantics: equal timestamps match (a right row sorts before any left
  * row at the same ts); right rows must be unique per (key, ts) —
  * pre-aggregate ties away, as the q130 usage does — while duplicate
  * LEFT rows are fine (the carried value is a pure function of the
  * preceding right rows, so tied left rows all see the same match).
  */
object AsOfJoin {

  /** Left rows plus `<prefix><valueCol>` columns from the matched right
    * row; unmatched left rows keep nulls (left-outer semantics — filter a
    * carried column for inner). `valueCols` are right-side columns to
    * carry (may include the right's own `tsCol`). */
  private val Reserved = Set("__ts", "__side", "__lv", "__rv", "__carried")

  def asOf(
      left: DataFrame, right: DataFrame, keyCols: Seq[String],
      tsCol: String, valueCols: Seq[String],
      prefix: String = "asof_"): DataFrame = {
    // fail fast instead of silently corrupting output: the staging names
    // are reserved, and every carried `prefix+valueCol` must be free on
    // the left side (keys, ts and payload alike)
    val reservedHits =
      (left.columns ++ right.columns).filter(Reserved.contains).distinct
    require(reservedHits.isEmpty,
      s"asOf reserves column names ${Reserved.mkString(", ")}; " +
        s"inputs carry ${reservedHits.mkString(", ")}")
    val collisions = valueCols.map(prefix + _).filter(left.columns.contains)
    require(collisions.isEmpty,
      s"asOf output collision with left columns: ${collisions.mkString(", ")}" +
        " — pick a different prefix")
    val leftPayload = left.columns.toSeq.diff(keyCols :+ tsCol)
    // struct() of zero columns is degenerate — carry a placeholder instead
    val lv = if (leftPayload.isEmpty) lit(0)
      else struct(leftPayload.map(col): _*)
    val l = left.select(
      keyCols.map(col) ++ Seq(
        col(tsCol).as("__ts"), lit(1).as("__side"),
        lv.as("__lv")): _*)
    val r = right.select(
      keyCols.map(col) ++ Seq(
        col(tsCol).as("__ts"), lit(0).as("__side"),
        struct(valueCols.map(col): _*).as("__rv")): _*)
    // allowMissingColumns fills __rv null on left rows and __lv null on
    // right rows — no hand-built null casts needed
    val u = l.unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    u.withColumn("__carried", last(col("__rv"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(
        keyCols.map(col) ++ Seq(col("__ts").as(tsCol)) ++
          leftPayload.map(c => col(s"__lv.$c").as(c)) ++
          valueCols.map(c => col(s"__carried.$c").as(prefix + c)): _*)
  }
}
