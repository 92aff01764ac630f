package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Edit-distance self-join (fuzzy entity matching) via q-gram prefix
  * filtering — all pairs of strings within Levenshtein distance `k`,
  * WITHOUT the quadratic cross join. The reference's flavor of this
  * problem is MBID/name cleanup: matching user-submitted artist and
  * recording names against canonical ones
  * (listenbrainz_spark/postgres/artist.py, the *_mbid_mapping tables).
  *
  * Blocking is the classic count/prefix filter (SSJoin family):
  * ed(s,t) ≤ k implies the q-gram multisets share at least
  * max(|Gs|,|Gt|) − q·k grams, and two multisets meeting that overlap
  * must collide inside their (q·k + 1)-element prefixes under ANY global
  * canonical element order. Rarest-first ordering (global gram frequency
  * ascending) makes those prefixes the least-blocking grams in the
  * corpus, so candidate blocks stay small and skew-free.
  *
  * Multiset soundness: grams are keyed as (gram, occurrence#) — the
  * set intersection of occurrence-numbered grams equals the multiset
  * intersection (Σ min counts), so repeated grams ("0000…" runs) cannot
  * break the overlap bound the way plain-set grams would.
  *
  * Short strings (fewer than q·k + 1 grams, where the overlap bound goes
  * vacuous) fall back to a length-bucketed all-pairs pool; any string
  * pairable with a short one (len diff ≤ k) is also in the pool, so no
  * pair escapes. The pool is bounded by the short-string population —
  * at realistic name corpora a sliver — and pairs found by both paths
  * dedup before verification.
  *
  * Verification is exact and early-exiting: Spark's codegen'd
  * `levenshtein(l, r, threshold)` abandons a row as soon as the distance
  * exceeds k (returns −1), so the per-candidate cost is O(k·len), not
  * O(len²).
  *
  * 100 TB shape: one gram-frequency aggregate, one per-string prefix
  * window (id-keyed), one gram-keyed candidate join whose blocks are
  * rare-gram-bounded, then a verify over candidates only. No global
  * sort, no cross join; the q·k+1 prefix caps the per-string fan-out.
  * The candidate join and dedup shuffle BARE ID PAIRS — strings join
  * back id-keyed only for the final verify.
  *
  * Choosing `q` (measured, see SCALE.md round 6): block sizes scale with
  * corpus ÷ |distinct prefix grams|, so `q` must give the gram alphabet
  * enough entropy for the corpus. LOW-ENTROPY structured keys (zero-
  * padded IDs, fixed prefixes — the "Customer#000…" shape) have ~100
  * distinct informative bigrams: at 45k strings q=2 degenerates to
  * ~10⁸ candidate pairs while q=3 (10³ informative trigrams) keeps
  * blocks ~10× smaller and candidates ~100× fewer. Rule of thumb:
  * alphabet^q ≫ corpus/expected-block; natural-language names are fine
  * at q=2, digit-structured keys want q=3+.
  */
object FuzzyJoin {

  /** All unordered pairs (a_id < b_id) of distinct-id rows whose
    * `strCol` values are within Levenshtein distance `k`. Output:
    * (a_id, b_id, a_str, b_str, dist).
    */
  def selfJoin(
      df: DataFrame, idCol: String, strCol: String,
      k: Int, q: Int = 2): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(q >= 1, s"q must be >= 1, got $q")
    val prefixLen = q * k + 1
    // strings with fewer than prefixLen grams (len < q(k+1)) get a
    // vacuous overlap bound; anything within len+k of them joins the
    // same all-pairs pool so short-vs-longer pairs are still covered.
    val shortLen = q * (k + 1) + k

    val base = df.select(col(idCol).cast("long").as("id"),
      col(strCol).as("s")).filter(col("s").isNotNull)

    // ---- gram path (strings long enough for the prefix bound) -------
    val grams = base
      .filter(length(col("s")) >= q)
      .select(col("id"), col("s"),
        posexplode(expr(s"transform(sequence(0, length(s) - $q), " +
          s"i -> substring(s, i + 1, $q))")))
      .select(col("id"), col("s"), col("col").as("gram"), col("pos"))
      .withColumn("occ", row_number().over(
        Window.partitionBy(col("id"), col("gram")).orderBy(col("pos"))))
      .select(col("id"), col("s"), col("gram"), col("occ"))
    val freq = grams.groupBy(col("gram"), col("occ"))
      .agg(count(lit(1)).as("gf"))
    val prefixes = grams.join(freq, Seq("gram", "occ"))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("id"))
          .orderBy(col("gf"), col("gram"), col("occ"))))
      .filter(col("rk") <= prefixLen)
      .select(col("id"), col("gram"), col("occ"))
    val gramPairs = prefixes.as("a")
      .join(prefixes.as("b"),
        col("a.gram") === col("b.gram") && col("a.occ") === col("b.occ") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("a_id"), col("b.id").as("b_id"))

    // ---- short pool (vacuous-bound strings + their len-k neighbors) -
    val pool = base.filter(length(col("s")) < shortLen)
    val shortPairs = pool.as("a")
      .join(pool.as("b"), col("a.id") < col("b.id"))
      .select(col("a.id").as("a_id"), col("b.id").as("b_id"))

    // dedup on bare id pairs, THEN attach strings id-keyed for verify
    gramPairs.unionByName(shortPairs).distinct()
      .join(base.select(col("id").as("a_id"), col("s").as("a_str")),
        Seq("a_id"))
      .join(base.select(col("id").as("b_id"), col("s").as("b_str")),
        Seq("b_id"))
      .filter(abs(length(col("a_str")) - length(col("b_str"))) <= k)
      .withColumn("dist",
        levenshtein(col("a_str"), col("b_str"), k).cast("long"))
      .filter(col("dist") >= 0)
      .select(col("a_id"), col("b_id"), col("a_str"), col("b_str"),
        col("dist"))
  }
}
