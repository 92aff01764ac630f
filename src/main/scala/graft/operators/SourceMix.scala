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

  /** Temperature-scaled budget allocation — the multilingual/multi-source
    * rebalancing rule (sample ∝ size^α, α < 1, so small sources are
    * up-weighted relative to their share): splits `totalBudget` tokens
    * across groups proportionally to the SQUARE ROOT of each group's
    * token count (α = 0.5). Computed entirely in integer arithmetic —
    * per-group exact token counts, `floor(sqrt(count))` integer weights
    * (IEEE sqrt is correctly rounded, so the floor is engine-portable),
    * and `floor(totalBudget × weight / Σweights)` integer division — so
    * the allocation is bit-reproducible cross-engine, unlike a
    * float-normalized softmax whose sum depends on accumulation order.
    * Returns `(group, n_tokens, weight, budget)`; Σbudget ≤ totalBudget
    * (the floor remainder is deliberately left unallocated rather than
    * distributed by an arbitrary tie-break). One map-side-combinable
    * aggregation over the corpus; the result is config-sized. The
    * `totalBudget × weight` product runs in checked bigint arithmetic
    * (ANSI mode fails fast on overflow); at the 10^19-token extreme,
    * allocate in coarser granules (budget in millions of tokens) to keep
    * the product in range. */
  def temperatureBudgets(
      df: DataFrame, groupCol: String, tokensCol: Column,
      totalBudget: Long): DataFrame = {
    require(totalBudget >= 0, s"totalBudget must be >= 0, got $totalBudget")
    val counts = df.groupBy(col(groupCol))
      .agg(sum(tokensCol.cast("long")).as("n_tokens"))
    val weighted = counts.withColumn("weight",
      floor(sqrt(col("n_tokens").cast("double"))).cast("long"))
    val total = Window.partitionBy() // all groups: config-sized, one task
    weighted.withColumn("__tw", sum(col("weight")).over(total))
      // `div`: true integer division end-to-end — a double-typed `/`
      // would round above 2^53 and drift from the oracle's exact split
      .withColumn("budget", expr(s"($totalBudget * weight) div __tw"))
      .select(col(groupCol), col("n_tokens"), col("weight"), col("budget"))
  }
}
