package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** ALS envelope prober: runMain graft.ProbeAls <sfDir> — prints the raw
  * seeded validation RMSE (the float q276 collapses to a pinned bound)
  * and the q80 fit-envelope row, so the bound is MEASURED, not guessed. */
object ProbeAls {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val purchases = graft.core.Tables.lineitem(spark, dir)
      .join(graft.core.Tables.orders(spark, dir),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey"), col("l_partkey"))
    val pc = graft.recs.Als.buildPlaycounts(purchases, "o_custkey", "l_partkey")
    val n = pc.count()
    val Array(tr, va) = pc.randomSplit(Array(5.0, 1.0), 45L)
    val model = graft.recs.Als.train(tr)
    val rmse = new org.apache.spark.ml.evaluation.RegressionEvaluator()
      .setMetricName("rmse").setLabelCol("confidence")
      .setPredictionCol("prediction").evaluate(model.transform(va))
    println(s"ALS $dir n=$n train=${tr.count()} val=${va.count()} rmse=$rmse")
    graft.recs.Als.fitEnvelope(pc).show(false)
    spark.stop()
  }
}
