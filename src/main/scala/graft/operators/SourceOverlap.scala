package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cross-source n-gram overlap matrix — the corpus-composition audit:
  * for every pair of sources, how many distinct word n-grams they share,
  * and the containment coefficient |A∩B| / min(|A|,|B|). Run before
  * mixing sources into a training corpus to find the mirror sites,
  * re-crawls, and wholesale syndication that per-document dedup sees
  * only one pair at a time.
  *
  * Scale shape (100 TB): the naive plan — self-join the (source,
  * shingle) relation on the shingle — detonates on hot shingles (a
  * shingle present in s sources expands to s² join rows, and ubiquitous
  * boilerplate appears in ALL sources). Instead each shingle is reduced
  * to its distinct source SET (`collect_set`, bounded by the source
  * count — tens, not corpus-sized), and ordered pairs are emitted from
  * the sorted set per shingle: the expansion is s(s−1)/2 with s ≤
  * #sources, a constant, never a join blow-up. Two uniform shuffles
  * (distinct, then pair count); the per-source distinct sizes are a
  * broadcast-sized side table joined twice for the containment
  * denominator.
  */
object SourceOverlap {

  /** Distinct (`groupCol`, n-gram) pairs of `n` whitespace tokens —
    * exposed so differential tests can feed the naive self-join the
    * same relation the set-based plan consumes. */
  def shingles(
      docs: DataFrame, groupCol: String, textCol: String,
      n: Int): DataFrame = {
    val toks = filter(split(col(textCol), " "), t => t =!= "")
    docs.select(col(groupCol),
        explode(when(size(toks) >= n, transform(
            sequence(lit(0), size(toks) - n),
            i => concat_ws(" ", slice(toks, i + 1, lit(n)))))
          .otherwise(array().cast("array<string>"))).as("shingle"))
      .distinct()
  }

  /** Overlap matrix over `n`-gram shingles: one row per unordered
    * source pair (`src_a` < `src_b`) with the shared distinct-shingle
    * count, each side's distinct-shingle size, and the containment
    * coefficient. Pairs sharing nothing are absent (their containment
    * is 0). */
  def matrix(
      docs: DataFrame, groupCol: String, textCol: String,
      n: Int): DataFrame = {
    require(n > 0, s"n must be positive, got $n")
    val sh = shingles(docs, groupCol, textCol, n)

    val sizes = sh.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_shingles"))

    val pairs = sh.groupBy(col("shingle"))
      .agg(array_sort(collect_set(col(groupCol))).as("__srcs"))
      .select(explode(flatten(transform(col("__srcs"), (x, i) =>
        transform(slice(col("__srcs"), i + 2, size(col("__srcs"))),
          y => struct(x.as("src_a"), y.as("src_b")))))).as("__p"))
      .select(col("__p.src_a"), col("__p.src_b"))
      .groupBy(col("src_a"), col("src_b"))
      .agg(count(lit(1)).as("n_shared"))

    pairs
      .join(broadcast(sizes.withColumnRenamed(groupCol, "src_a")
        .withColumnRenamed("n_shingles", "n_a")), Seq("src_a"))
      .join(broadcast(sizes.withColumnRenamed(groupCol, "src_b")
        .withColumnRenamed("n_shingles", "n_b")), Seq("src_b"))
      .select(col("src_a"), col("src_b"), col("n_shared"),
        col("n_a"), col("n_b"),
        (col("n_shared") / least(col("n_a"), col("n_b")))
          .as("containment"))
  }
}
