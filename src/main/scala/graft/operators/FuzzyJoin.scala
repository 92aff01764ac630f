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
  *
  * That rule is now MEASURED, not trusted: [[buildIndex]] (hence
  * [[selfJoin]] and [[probe]]) computes the corpus's average gram-block
  * load — strings × (q·k+1) ÷ distinct grams, the multiplier that
  * measured 1239 on the degenerate 30× q=2 corpus versus ≤178 on every
  * healthy configuration — and fails fast when it exceeds
  * `maxAvgBlock` instead of silently going quadratic on a mis-set
  * knob. [[selectQ]] runs the same measurement for q = 2..qMax in ONE
  * corpus pass and returns the smallest gram size under the bound.
  */
object FuzzyJoin {

  /** Sentinel gram size: "measure, don't guess" — [[buildIndex]] and
    * [[selfJoin]] resolve it via [[selectQ]], so the DEFAULT path can
    * never dispatch the degenerate-q quadratic regime (the 22-minute
    * footgun round 6 measured); an explicit q still works and is still
    * validated against the measured block load. */
  val AutoQ: Int = 0

  /** Persisted blocking state for incremental matching: the corpus
    * side's normalized rows, canonical-prefix elements, gram-frequency
    * order, and short-string pool, all keyed by the (k, q) they were
    * built under. Write the four frames to parquet and an arriving batch
    * matches in O(batch), never O(corpus²) — the daily-ingest economics
    * of [[graft.dedup.MinHash]]'s incremental index applied to entity
    * matching. */
  final case class FuzzyIndex(
      base: DataFrame, prefixes: DataFrame, freq: DataFrame,
      pool: DataFrame, k: Int, q: Int)

  private def normalized(df: DataFrame, idCol: String, strCol: String) =
    df.select(col(idCol).cast("long").as("id"),
      col(strCol).as("s")).filter(col("s").isNotNull)

  /** (id, s, gram, occ) occurrence-numbered grams of `base`. */
  private def gramsOf(base: DataFrame, q: Int): DataFrame =
    base.filter(length(col("s")) >= q)
      .select(col("id"), col("s"),
        posexplode(expr(s"transform(sequence(0, length(s) - $q), " +
          s"i -> substring(s, i + 1, $q))")))
      .select(col("id"), col("s"), col("col").as("gram"), col("pos"))
      .withColumn("occ", row_number().over(
        Window.partitionBy(col("id"), col("gram")).orderBy(col("pos"))))
      .select(col("id"), col("s"), col("gram"), col("occ"))

  /** Canonical (q·k+1)-element prefixes of `grams` under the rarity
    * order `freq` defines. Grams absent from `freq` count as frequency
    * 0 — rarer than anything seen — which keeps the order a consistent
    * EXTENSION of the index's order, so corpus prefixes computed
    * without knowledge of a later batch remain valid (the lemma only
    * needs one shared total order). */
  private def prefixesOf(
      grams: DataFrame, freq: DataFrame, prefixLen: Int): DataFrame =
    grams.join(freq, Seq("gram", "occ"), "left")
      .withColumn("__gf", coalesce(col("gf"), lit(0L)))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("id"))
          .orderBy(col("__gf"), col("gram"), col("occ"))))
      .filter(col("rk") <= prefixLen)
      .select(col("id"), col("gram"), col("occ"))

  /** Exact verify over candidate id pairs: dedup bare ids, attach
    * strings id-keyed, length filter, early-exit levenshtein. */
  private def verify(
      pairs: DataFrame, aBase: DataFrame, bBase: DataFrame,
      k: Int): DataFrame =
    pairs.distinct()
      .join(aBase.select(col("id").as("a_id"), col("s").as("a_str")),
        Seq("a_id"))
      .join(bBase.select(col("id").as("b_id"), col("s").as("b_str")),
        Seq("b_id"))
      .filter(abs(length(col("a_str")) - length(col("b_str"))) <= k)
      .withColumn("dist",
        levenshtein(col("a_str"), col("b_str"), k).cast("long"))
      .filter(col("dist") >= 0)
      .select(col("a_id"), col("b_id"), col("a_str"), col("b_str"),
        col("dist"))

  /** Average gram-block load of gram size `q` on `base`: strings with
    * ≥1 gram × prefix length ÷ distinct grams — the expected per-gram
    * string count if prefixes spread evenly, i.e. the knob candidate
    * volume is quadratic in. 0 when no string yields a gram (the short
    * pool covers those). One corpus pass, two scalar anchors. */
  private def blockLoadOf(base: DataFrame, q: Int, k: Int): Double = {
    val r = base.filter(length(col("s")) >= q)
      .select(col("id"),
        explode(expr(s"transform(sequence(0, length(s) - $q), " +
          s"i -> substring(s, i + 1, $q))")).as("gram"))
      .agg(countDistinct(col("gram")).as("d"),
        countDistinct(col("id")).as("n")).collect()(0)
    if (r.isNullAt(0) || r.getLong(0) == 0L) 0.0
    else r.getLong(1).toDouble * (q * k + 1) / r.getLong(0).toDouble
  }

  /** Smallest gram size in [2, qMax] whose measured block load stays
    * under `maxAvgBlock` for this corpus — ONE corpus pass measures all
    * candidate sizes at once. Throws when even qMax is degenerate
    * (pathologically low-entropy corpus: raise qMax or rethink the
    * blocking key). Run once per corpus shape and pin the result; the
    * per-build validation in [[buildIndex]] then guards against drift. */
  def selectQ(
      df: DataFrame, idCol: String, strCol: String, k: Int,
      maxAvgBlock: Double = 512.0, qMax: Int = 6): Int = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(qMax >= 2, s"qMax must be >= 2, got $qMax")
    val base = normalized(df, idCol, strCol)
    val empty = "cast(array() as array<struct<q:int,gram:string>>)"
    val stats = base.select(col("id"),
        explode(expr(s"flatten(transform(sequence(2, $qMax), q -> " +
          "CASE WHEN length(s) >= q THEN " +
          "transform(sequence(0, length(s) - q), " +
          "i -> named_struct('q', q, 'gram', substring(s, i + 1, q))) " +
          s"ELSE $empty END))")).as("g"))
      .select(col("g.q").as("q"), col("g.gram").as("gram"), col("id"))
      .groupBy(col("q"))
      .agg(countDistinct(col("gram")).as("d"),
        countDistinct(col("id")).as("n"))
      .collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2))).toMap
    (2 to qMax).find { q =>
      stats.get(q).exists { case (d, n) =>
        d > 0L && n.toDouble * (q * k + 1) / d <= maxAvgBlock
      }
    }.getOrElse {
      val seen = (2 to qMax).map(q => stats.get(q) match {
        case Some((d, n)) if d > 0 =>
          f"q=$q load=${n.toDouble * (q * k + 1) / d}%.0f"
        case _ => s"q=$q load=n/a"
      }).mkString(", ")
      throw new IllegalArgumentException(
        s"no gram size in [2,$qMax] keeps avg block load under " +
          s"$maxAvgBlock ($seen): the corpus is too low-entropy for " +
          "q-gram blocking — raise qMax or block on a different key")
    }
  }

  /** Build the corpus-side index for [[probe]] (also the first half of
    * [[selfJoin]]). Persist the four frames to serve repeated batches.
    *
    * `validate` (default on) measures the corpus's block load for this
    * (q, k) and fails fast above `maxAvgBlock` — the measured degenerate
    * regime (load 1239 ⇒ >22 min at 30×; healthy configs ≤178) — naming
    * [[selectQ]] in the error. The measurement is one extra corpus
    * pass; a production pipeline that has already pinned q via
    * [[selectQ]] can pass `validate = false` to skip it. */
  def buildIndex(
      df: DataFrame, idCol: String, strCol: String,
      k: Int, q: Int = AutoQ, validate: Boolean = true,
      maxAvgBlock: Double = 512.0): FuzzyIndex = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(q >= 0, s"q must be >= 1 (or AutoQ = 0 to measure), got $q")
    // AutoQ: one corpus pass measures every candidate gram size and picks
    // the smallest viable one — selectQ throws on degenerate corpora, so
    // the per-q validation below is already satisfied
    val qr = if (q == AutoQ)
      selectQ(df, idCol, strCol, k, maxAvgBlock)
    else q
    if (validate && q != AutoQ) {
      val base0 = normalized(df, idCol, strCol)
      val load = blockLoadOf(base0, qr, k)
      require(load <= maxAvgBlock,
        f"q=$qr is degenerate on this corpus (avg gram-block load " +
          f"$load%.0f > $maxAvgBlock%.0f): candidate generation would " +
          "go quadratic — use selectQ to pick q, or raise q manually")
    }
    val prefixLen = qr * k + 1
    // strings with fewer than prefixLen grams (len < q(k+1)) get a
    // vacuous overlap bound; anything within len+k of them joins the
    // same all-pairs pool so short-vs-longer pairs are still covered.
    val shortLen = qr * (k + 1) + k
    val base = normalized(df, idCol, strCol)
    val grams = gramsOf(base, qr)
    val freq = grams.groupBy(col("gram"), col("occ"))
      .agg(count(lit(1)).as("gf"))
    FuzzyIndex(
      base = base,
      prefixes = prefixesOf(grams, freq, prefixLen),
      freq = freq,
      pool = base.filter(length(col("s")) < shortLen),
      k = k, q = qr)
  }

  /** All unordered pairs (a_id < b_id) of distinct-id rows whose
    * `strCol` values are within Levenshtein distance `k`. Output:
    * (a_id, b_id, a_str, b_str, dist).
    */
  def selfJoin(
      df: DataFrame, idCol: String, strCol: String,
      k: Int, q: Int = AutoQ, validate: Boolean = true): DataFrame = {
    val idx = buildIndex(df, idCol, strCol, k, q, validate)
    val gramPairs = idx.prefixes.as("a")
      .join(idx.prefixes.as("b"),
        col("a.gram") === col("b.gram") && col("a.occ") === col("b.occ") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("a_id"), col("b.id").as("b_id"))
    val shortPairs = idx.pool.as("a")
      .join(idx.pool.as("b"), col("a.id") < col("b.id"))
      .select(col("a.id").as("a_id"), col("b.id").as("b_id"))
    verify(gramPairs.unionByName(shortPairs), idx.base, idx.base, k)
  }

  /** Incremental match of a NEW batch against an indexed corpus:
    * corpus↔batch pairs plus batch-internal pairs, never corpus×corpus
    * — per batch this costs O(batch) gram work, a batch-sized candidate
    * join against the index, and the batch's own self-join. Ids must be
    * disjoint from the corpus; output is [[selfJoin]]'s contract
    * restricted to pairs touching the batch. Batch prefixes use the
    * INDEX's gram frequencies (unseen grams rank rarest — see
    * [[prefixesOf]] for why that stays sound), so the index is never
    * recomputed. */
  def probe(
      idx: FuzzyIndex, batch: DataFrame,
      idCol: String, strCol: String): DataFrame = {
    val prefixLen = idx.q * idx.k + 1
    val shortLen = idx.q * (idx.k + 1) + idx.k
    val bBase = normalized(batch, idCol, strCol)
    val bPrefixes = prefixesOf(gramsOf(bBase, idx.q), idx.freq, prefixLen)
    val crossGram = idx.prefixes.as("a")
      .join(bPrefixes.as("b"),
        col("a.gram") === col("b.gram") && col("a.occ") === col("b.occ"))
      .select(least(col("a.id"), col("b.id")).as("a_id"),
        greatest(col("a.id"), col("b.id")).as("b_id"))
    // batch short pool is batch-bounded: broadcast it into the corpus
    // pool scan (never a CartesianProduct of two unbounded sides)
    val bPool = bBase.filter(length(col("s")) < shortLen)
      .select(col("id").as("__bp_id"))
    val crossShort = idx.pool
      .crossJoin(broadcast(bPool))
      .select(least(col("id"), col("__bp_id")).as("a_id"),
        greatest(col("id"), col("__bp_id")).as("b_id"))
    val all = idx.base.unionByName(bBase)
    val crossPairs = verify(
      crossGram.unionByName(crossShort)
        .filter(col("a_id") =!= col("b_id")),
      all, all, idx.k)
    crossPairs.unionByName(
      selfJoin(batch, idCol, strCol, idx.k, idx.q)).distinct()
  }
}
