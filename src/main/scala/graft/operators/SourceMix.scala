package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic data-mixture realization: fill each source's token
  * budget greedily in hash order. Training-data recipes end with "take
  * 30B tokens of web, 5B of code, 2B of papers" — this operator turns
  * that spec into an exact, reproducible document manifest: within each
  * group, documents are ranked by md5(id ‖ salt) (an arbitrary-but-fixed
  * uniform order, the q79/q137 technique) and accepted while the tokens
  * BEFORE them fit the budget, so exactly the first document to cross
  * the boundary is the last one in. Re-running with the same salt
  * reproduces the mixture bit-for-bit on any engine with md5; changing
  * the salt re-deals it.
  *
  * Scale shape (100 TB): one window per group — a rank plus a running
  * sum over the same (group, hash-order) sort, so it costs ONE shuffle
  * keyed on the group. Group count is the mixture's source list (tens),
  * so per-group partitions are large but the work is a single external
  * sort-merge per group — the exact path. The budgets frame is
  * config-sized and broadcast. When even one sort per source is too much
  * (a single web crawl at 90% of the corpus), the documented relaxation
  * is two-phase: sample the hash space to estimate the cutoff rank, then
  * filter `md5 < cutoff` shuffle-free — the manifest stays deterministic
  * but the boundary document becomes approximate; this operator is the
  * exact reference semantics that relaxation must reproduce.
  */
object SourceMix {

  /** Greedy budget fill. `budgets` maps group value → token budget; rows
    * whose group has no budget are dropped (not in the mixture). Returns
    * the ACCEPTED manifest: input columns plus `mix_rank` (1-based hash
    * order within the group) and `cum_start` (tokens accepted before
    * this document — `cum_start < budget` is the acceptance rule). */
  def fillToBudget(
      df: DataFrame, groupCol: String, idCol: String, tokensCol: Column,
      budgets: Map[String, Long], salt: String): DataFrame = {
    require(budgets.nonEmpty, "budgets must not be empty")
    require(budgets.values.forall(_ >= 0), "budgets must be non-negative")
    val reserved = Seq("mix_rank", "cum_start", "__tok", "__budget")
      .filter(df.columns.contains)
    require(reserved.isEmpty,
      s"input already has output column(s) ${reserved.mkString(", ")} — " +
        "rename them before mixing")
    val spark = df.sparkSession
    import spark.implicits._
    val b = broadcast(budgets.toSeq.toDF(groupCol, "__budget"))
    val order = Seq(
      md5(concat(col(idCol).cast("string"), lit(":"), lit(salt))
        .cast("binary")),
      col(idCol))
    val w = Window.partitionBy(col(groupCol)).orderBy(order: _*)
    df.withColumn("__tok", tokensCol.cast("long"))
      .join(b, Seq(groupCol)) // inner: groups without a budget drop out
      .withColumn("mix_rank", row_number().over(w))
      .withColumn("cum_start",
        coalesce(sum(col("__tok")).over(
          w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .filter(col("cum_start") < col("__budget"))
      .drop("__tok", "__budget")
  }
}
