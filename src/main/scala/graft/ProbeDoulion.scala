package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Triangles

/** Exact vs DOULION triangle cost on the part co-order graph —
  * runMain graft.ProbeDoulion <sfDir> [keepHex]. Adjudicates the p³
  * shuffle-cut claim behind q217 at scale. */
object ProbeDoulion {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val keepHex = if (args.length > 1) args(1).toInt else 8
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val li = graft.core.Tables.lineitem(spark, dir)
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
    val raw = li.alias("x").join(li.alias("y"),
        col("x.o") === col("y.o") && col("x.p") < col("y.p"))
      .select(col("x.p").as("src"), col("y.p").as("dst"))
    // pin the distinct canonical edges, never the raw pair multiset
    val e = Triangles.canonical(raw, "src", "dst").transform(graft.core.Pin.apply)

    def time(label: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
      df.write.format("noop").mode("overwrite").save() // warm
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      println(f"[doulion] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }

    time("exact count")(
      Triangles.triangles(e, "a", "b")
        .agg(count(lit(1)).as("exact_triangles")))
    time(s"doulion keepHex=$keepHex")(
      Triangles.doulion(e, "a", "b", keepHex))
    Triangles.doulion(e, "a", "b", keepHex).show(1, false)
    // error-vs-p envelope at scale: estimates across salts per keep rate,
    // against the exact count — the measured accuracy story behind the
    // sampling knob (SCALE.md round 8)
    val exact = Triangles.triangles(e, "a", "b").count().toDouble
    for (kh <- Seq(8, 4, 1)) {
      val errs = (0 until 4).map { i =>
        val est = Triangles.doulion(e, "a", "b", kh, salt = s"env$i")
          .collect()(0).getLong(1)
        math.abs(est - exact) / exact
      }
      println(f"[doulion] exact=$exact%.0f keepHex=$kh rel errs: " +
        errs.map(x => f"$x%.4f").mkString(" "))
    }
    spark.stop()
  }
}
