package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact-sufficient-statistics correlation between two integer-valued
  * metrics — Pearson, and Spearman as Pearson over doubled mid-ranks —
  * the pairwise-association member of the statistics family
  * ([[ChiSquare]] categorical×categorical, [[Welch]]
  * categorical×numeric, [[KsTest]] distribution drift, this one
  * numeric×numeric).
  *
  * Determinism discipline: the corpus contributes only EXACT sums —
  * n, Σx, Σy as bigints; Σxy, Σx², Σy² accumulated in decimal(38,0)
  * (second moments of doubled ranks reach 4n³, past int64 already at
  * ~1.3M rows — decimal keeps them exact to 10³⁸, i.e. any realistic
  * corpus) and cast ONCE to double on output. The coefficient is then
  * a FIXED tree of IEEE steps over those values (the [[Welch]]
  * recipe): `mx = Σx/n`, `cov = Σxy/n − mx·my`,
  * `vx = Σx²/n − mx·mx`, `r = cov / (sqrt(vx)·sqrt(vy))` — the
  * mean-centered order that never forms the int64-overflowing
  * `n·Σxy − Σx·Σy` product ([[ChiSquare]]'s N·det² lesson).
  *
  * Spearman assigns each row the MID-RANK of its value ×2 to stay
  * integral (the [[Evaluation]] AUC scaling: 2·less + cnt + 1 per
  * distinct value) — ties exact, no float rank ever exists.
  *
  * Scale shape (100 TB of metric pairs): Pearson is ONE map-side
  * combinable aggregate (a 6-value row crosses the wire). Spearman
  * adds one `groupBy(value)` per axis plus [[PrefixSum.runningTotal]]'s
  * range exchange — distinct values cross the wire, never rows, no
  * single-partition window plans — and two joins of the rank maps
  * back to the pairs (rank maps are distinct-value-sized; AQE
  * broadcasts them when small).
  */
object Correlation {

  /** One-row frame `n sx sy` (exact bigints), `sxy sxx syy` (exact
    * decimal sums cast once to double) + `pearson_r` (null when
    * either variance is zero or n < 2). */
  def pearson(df: DataFrame, x: Column, y: Column): DataFrame =
    pearsonFrom(df.select(x.cast("long").as("__x"),
      y.cast("long").as("__y")), "pearson_r")

  private def pearsonFrom(pairs: DataFrame, outName: String): DataFrame = {
    val xd = col("__x").cast("decimal(38,0)")
    val yd = col("__y").cast("decimal(38,0)")
    val base = pairs.agg(
      count(lit(1)).as("n"),
      sum(col("__x")).as("sx"), sum(col("__y")).as("sy"),
      sum(xd * yd).cast("double").as("sxy"),
      sum(xd * xd).cast("double").as("sxx"),
      sum(yd * yd).cast("double").as("syy"))
    base
      .withColumn("mx", col("sx").cast("double") / col("n"))
      .withColumn("my", col("sy").cast("double") / col("n"))
      .withColumn("cov", col("sxy") / col("n") - col("mx") * col("my"))
      .withColumn("vx", col("sxx") / col("n") - col("mx") * col("mx"))
      .withColumn("vy", col("syy") / col("n") - col("my") * col("my"))
      .withColumn(outName,
        when(col("n") < 2L || col("vx") <= 0.0 || col("vy") <= 0.0,
          lit(null).cast("double"))
          .otherwise(col("cov") / (sqrt(col("vx")) * sqrt(col("vy")))))
      .drop("mx", "my", "cov", "vx", "vy")
  }

  /** One-row frame: the Pearson sufficient statistics over DOUBLED
    * mid-ranks + `spearman_r`. Ties get the exact average rank; ×2
    * keeps every rank integral. */
  def spearman(df: DataFrame, x: Column, y: Column): DataFrame = {
    val pairs = df.select(x.cast("long").as("vx"),
      y.cast("long").as("vy"))
    def rank2(c: String): DataFrame = {
      val perValue = pairs.groupBy(col(c).as("v"))
        .agg(count(lit(1)).as("cnt"))
      PrefixSum.runningTotal(perValue, Seq(col("v")), col("cnt"),
          out = "cum")
        .select(col("v").as(c),
          (lit(2L) * (col("cum") - col("cnt")) + col("cnt") + lit(1L))
            .as(s"${c}_r2"))
    }
    val ranked = pairs
      .join(rank2("vx"), Seq("vx"))
      .join(rank2("vy"), Seq("vy"))
      .select(col("vx_r2").as("__x"), col("vy_r2").as("__y"))
    pearsonFrom(ranked, "spearman_r")
  }
}
