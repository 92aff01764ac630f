package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bigram familiarity scoring at production shuffle widths.
  *
  * The oracled shape (q174, queries/TextOps.scala) keys BOTH of its
  * shuffles — the corpus bigram count aggregation and the join back to
  * doc occurrences — on the bigram STRING, whose average width (two
  * words + separator) multiplies every exchanged byte. At 100 TB that
  * string traffic IS the job cost (the round-5 30× probe measured the
  * string-keyed shape at 25× data growth). These are the two relaxations
  * the q174 scaladoc promised:
  *
  *   - [[scoreHashed]] — EXACT scores on 8-byte keys: every bigram is
  *     reduced to `xxhash64(bigram)` before either shuffle, so the
  *     count aggregation and the count join exchange fixed-width longs.
  *     Scores equal the string-keyed scores unless two distinct corpus
  *     bigrams collide in 64 bits (probability ≈ n²/2⁶⁵ — at even 10¹⁰
  *     distinct bigrams that is ~0.3%, and a collision perturbs only the
  *     two colliding bigrams' counts by each other's magnitude). The
  *     BigramFamiliaritySpec proves score equality on a fixture corpus,
  *     and q179 proves it against the string-keyed DuckDB oracle.
  *
  *   - [[scoreTopK]] — the broadcast regime: only the top-K bigrams
  *     (by count desc, bigram asc — fully deterministic) keep their
  *     exact counts; the long tail defaults to count 1 ("unfamiliar").
  *     The count aggregation still runs once (hash-keyed, 8-byte
  *     shuffle), but the JOIN back to doc occurrences — the exchange
  *     that scales with corpus size, not vocabulary — becomes a
  *     broadcast hash join of a K-row table: the doc side never
  *     shuffles at all. Zipf makes this a good score approximation
  *     (the head carries nearly all familiar mass); it is exactly the
  *     familiar/unfamiliar binarization most quality gates threshold
  *     on anyway.
  *
  * Both paths tokenize identically to q174: whitespace split, empty
  * tokens dropped, docs with <2 tokens have no bigrams and are absent
  * from the output.
  */
object BigramFamiliarity {

  /** (idCol, bigram) occurrence rows — one per adjacent token pair. */
  def bigrams(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = filter(split(col(textCol), " "), t => t =!= "")
    docs.select(col(idCol),
      explode(when(size(toks) >= 2,
        transform(sequence(lit(0), size(toks) - 2),
          i => concat_ws(" ", slice(toks, i + 1, lit(2)))))
        .otherwise(array().cast("array<string>"))).as("bigram"))
  }

  /** Exact familiarity scores with both shuffles keyed on
    * `xxhash64(bigram)` — (id, n_bigrams, familiar_sum, score). */
  def scoreHashed(
      docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val occ = bigrams(docs, idCol, textCol)
      .select(col(idCol), xxhash64(col("bigram")).as("bg_key"))
    val counts = occ.groupBy(col("bg_key"))
      .agg(count(lit(1)).as("bg_count"))
    occ.join(counts, Seq("bg_key"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"),
        sum(col("bg_count")).as("familiar_sum"))
      .withColumn("score", col("familiar_sum") / col("n_bigrams"))
  }

  /** Broadcast-top-K familiarity: top-K bigrams (count desc, bigram asc)
    * keep exact counts, the tail defaults to 1. The scoring join is a
    * broadcast of the K-row table — the doc side does not shuffle.
    * Counts aggregate on the 8-byte hash key; the string rides along as
    * a `min` aggregate only to make the top-K tie-break deterministic
    * and engine-replayable. */
  def scoreTopK(
      docs: DataFrame, idCol: String, textCol: String,
      k: Int = 100): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val occ = bigrams(docs, idCol, textCol)
      .select(col(idCol), col("bigram"),
        xxhash64(col("bigram")).as("bg_key"))
    val counts = occ.groupBy(col("bg_key"))
      .agg(count(lit(1)).as("bg_count"), min(col("bigram")).as("bigram"))
    val top = counts
      .orderBy(col("bg_count").desc, col("bigram"))
      .limit(k)
      .select(col("bg_key"), col("bg_count"))
    occ.join(broadcast(top), Seq("bg_key"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"),
        sum(coalesce(col("bg_count"), lit(1L))).as("familiar_sum"))
      .withColumn("score", col("familiar_sum") / col("n_bigrams"))
  }
}
