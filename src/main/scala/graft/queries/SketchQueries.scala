package graft.queries

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.operators.{CountMin, Vocabulary}

/** Sketch-based approximate operators: sublinear structures whose
  * shuffles are bounded by the SKETCH size, not the data — the 100 TB
  * answer when exact distinct/frequency aggregation would carry every
  * key. Each query pins the sketch deterministically: the hash families
  * are md5-derived, so the oracle replays the sketch cell-for-cell and
  * the verdict is hash-exact, not a tolerance.
  */
object SketchQueries {

  // ---------------------------------------------------------------- q153
  /** Count-min token frequency ([[graft.operators.CountMin]]): a 4×4096
    * md5-hashed sketch over every corpus token, point-estimated at the
    * top-25 vocabulary. The oracle replays tokenization, the exact
    * counts, every populated sketch cell, AND the min-of-cells
    * estimates, so the verdict pins the whole structure; `never_under`
    * states the CMS guarantee (estimate ≥ truth) the driver then
    * verifies row-by-row. */
  val q153CmsFrequency = Q(
    "q153_cms_frequency",
    (s, d) => {
      val docs = Tables.documents(s, d)
      val toks = docs.select(
        explode(filter(split(col("text"), " "), t => t =!= "")).as("word"))
      val sk = CountMin.sketch(toks, "word", depth = 4, hexChars = 3)
      val vocab = Vocabulary.build(docs, "text", n = 25)
      CountMin.estimate(sk, vocab, "word", depth = 4, hexChars = 3)
        .select(col("word"), col("rank").as("vocab_rank"),
          col("n_occurrences"), col("cms_count"),
          (col("cms_count") >= col("n_occurrences")).as("never_under"))
        .orderBy(col("word"))
    },
    Some("""WITH w AS (SELECT unnest(
          list_filter(string_split(text, ' '), t -> t <> '')) AS word
        FROM documents),
      c AS (SELECT word, count(*) AS n_occurrences FROM w GROUP BY word),
      v AS (SELECT word, n_occurrences, row_number() OVER (
          ORDER BY n_occurrences DESC, word) AS vocab_rank
        FROM c ORDER BY n_occurrences DESC, word LIMIT 25),
      cells AS (SELECT u.r AS cr,
          substr(md5(word || ':cms' || cast(u.r AS varchar)), 1, 3) AS cb,
          count(*) AS cnt
        FROM w, unnest(generate_series(0, 3)) AS u(r) GROUP BY 1, 2),
      probes AS (SELECT v.word, u.r AS pr,
          substr(md5(v.word || ':cms' || cast(u.r AS varchar)), 1, 3) AS pb
        FROM v, unnest(generate_series(0, 3)) AS u(r)),
      est AS (SELECT word, min(coalesce(cnt, 0)) AS cms_count
        FROM probes LEFT JOIN cells ON pr = cr AND pb = cb
        GROUP BY word)
      SELECT v.word, vocab_rank, n_occurrences, cms_count,
        cms_count >= n_occurrences AS never_under
      FROM v JOIN est USING (word) ORDER BY v.word"""))

  val all: Seq[Q] = Seq(q153CmsFrequency)
}
