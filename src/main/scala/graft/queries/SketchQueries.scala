package graft.queries

import org.apache.spark.sql.{Column, functions => F}
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.operators.{BloomPrune, CountMin, Vocabulary}

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

  /** Spark-side mirror of [[Q.sqlCents]]. */
  private def centsSum(e: Column, name: String, scale: Int = 2): Column = {
    val f = math.pow(10, scale).toLong
    (F.sum(round(e * f).cast("long")) / f.toDouble).as(name)
  }

  // ---------------------------------------------------------------- q176
  /** Bloom-pruned fact⋈dim join ([[graft.operators.BloomPrune.pruneLong]]):
    * high-value orders (~10% of the dim) drive a bloom filter that drops
    * ~90% of lineitem BEFORE the join's exchange; the exact join then
    * removes the bloom's false positives, so the result — and the oracle,
    * a plain SQL join — is identical to the un-pruned plan. The pruning
    * is the 100 TB point: the fact rows that cannot match never enter
    * the shuffle (see BloomPrune scaladoc for the broadcast-vs-shuffle
    * regime analysis). BloomPruneSpec separately asserts the differential
    * equality, the no-false-negative guarantee, and that the probe
    * filter sits under the join in the executed plan. */
  val q176BloomJoin = Q(
    "q176_bloom_join",
    (s, d) => {
      val dim = Tables.orders(s, d)
        .filter(col("o_totalprice") > 450000)
        .select(col("o_orderkey"), col("o_orderpriority"))
      val fact = Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
      BloomPrune.pruneLong(fact, "l_orderkey", dim, "o_orderkey")
        .join(dim, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(
          centsSum(col("l_extendedprice") * (lit(1) - col("l_discount")),
            "revenue", 4),
          count(lit(1)).as("n_items"))
        .orderBy(col("o_orderpriority"))
    },
    Some(s"""SELECT o_orderpriority,
      ${Q.sqlCents("l_extendedprice * (1 - l_discount)", "revenue", 4)},
      count(*) AS n_items
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE o_totalprice > 450000
      GROUP BY o_orderpriority ORDER BY o_orderpriority"""))

  // ---------------------------------------------------------------- q177
  /** Bloom-accelerated anti join ([[BloomPrune.antiJoinLong]]): lineitems
    * of NON-urgent orders. Keys the bloom reports absent are GUARANTEED
    * non-matching (blooms have no false negatives), so ~80% of the fact
    * settles its anti-join verdict without shuffling; only might-contain
    * rows take the exact anti join. Row-identical to a plain NOT EXISTS
    * — which is exactly what the oracle runs. DuckDB's sum(bigint) is
    * hugeint, hence the explicit casts back to bigint. */
  val q177BloomAnti = Q(
    "q177_bloom_anti",
    (s, d) => {
      val urgent = Tables.orders(s, d)
        .filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_orderkey"))
      val fact = Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_returnflag"), col("l_quantity"))
      BloomPrune.antiJoinLong(fact, "l_orderkey", urgent, "o_orderkey")
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n_items"),
          F.sum(col("l_quantity").cast("long")).as("sum_qty"))
        .orderBy(col("l_returnflag"))
    },
    Some("""SELECT l_returnflag, count(*) AS n_items,
        cast(sum(cast(l_quantity AS bigint)) AS bigint) AS sum_qty
      FROM lineitem l
      WHERE NOT EXISTS (SELECT 1 FROM orders o
        WHERE o.o_orderkey = l.l_orderkey
          AND o.o_orderpriority = '1-URGENT')
      GROUP BY l_returnflag ORDER BY l_returnflag"""))

  // ---------------------------------------------------------------- q178
  /** String-keyed bloom prune ([[BloomPrune.pruneString]]) — the
    * reference's actual join-key regime: listen facts join/anti-join
    * metadata on STRING mbids (listenbrainz_spark/listens/data.py:73-75),
    * not longs. Both sides reduce to 8-byte `xxhash64` keys so the
    * bloom build and the codegen'd probe stay the long machinery —
    * the filter never stores variable-length strings, and the fact-side
    * shuffle still drops ~95% of rows (Brand#4 ≈ 5% of parts) before
    * the exchange. The deterministic hash preserves no-false-negatives;
    * collisions only add false positives, which the exact string join
    * removes — so the oracle is the plain SQL join. The mbid-style
    * key (`'mbid-' || partkey`) makes the string genuinely carry the
    * join, not merely decorate a numeric one. */
  val q178BloomStringJoin = Q(
    "q178_bloom_string_join",
    (s, d) => {
      val dim = Tables.part(s, d)
        .filter(col("p_brand") === "Brand#4")
        .select(concat(lit("mbid-"), col("p_partkey")).as("part_mbid"),
          col("p_type"))
      val fact = Tables.lineitem(s, d)
        .select(concat(lit("mbid-"), col("l_partkey")).as("fact_mbid"),
          col("l_quantity"), col("l_extendedprice"))
      BloomPrune.pruneString(fact, "fact_mbid", dim, "part_mbid")
        .join(dim, col("fact_mbid") === col("part_mbid"))
        .groupBy(col("p_type"))
        .agg(count(lit(1)).as("n_items"),
          F.sum(col("l_quantity").cast("long")).as("sum_qty"),
          centsSum(col("l_extendedprice"), "sum_price"))
        .orderBy(col("p_type"))
    },
    Some(s"""SELECT p_type, count(*) AS n_items,
      cast(sum(cast(l_quantity AS bigint)) AS bigint) AS sum_qty,
      ${Q.sqlCents("l_extendedprice", "sum_price")}
      FROM lineitem JOIN part
        ON 'mbid-' || cast(l_partkey AS varchar)
         = 'mbid-' || cast(p_partkey AS varchar)
      WHERE p_brand = 'Brand#4'
      GROUP BY p_type ORDER BY p_type"""))

  // ---------------------------------------------------------------- q206
  /** Sketch-based join-cardinality estimation: |lineitem ⋈ σ(part)| on
    * partkey predicted from two CMS sketches' row-wise inner products
    * ([[graft.operators.CountMin.innerProduct]] — the AMS/CMS planner
    * technique: size a shuffle join from two depth×width cell tables
    * WITHOUT touching either relation), reported beside the exact join
    * count and the guaranteed-≥1 over-ratio. Sketches are md5-bucketed,
    * so the oracle replays every cell, the row inner products, the min,
    * and the exact join. */
  val q206CmsJoinEstimate = Q(
    "q206_cms_join_estimate",
    (s, d) => {
      val fact = Tables.lineitem(s, d).select(col("l_partkey"))
      val dim = Tables.part(s, d).filter(col("p_size") > 45)
        .select(col("p_partkey"))
      val est = CountMin.innerProduct(
        CountMin.sketch(fact, "l_partkey", depth = 4, hexChars = 3),
        CountMin.sketch(dim, "p_partkey", depth = 4, hexChars = 3))
      val exact = fact.join(dim, col("l_partkey") === col("p_partkey"))
        .agg(count(lit(1)).as("exact_join_size"))
      est.crossJoin(exact)
        .withColumn("over_ratio",
          col("join_size_est").cast("double") /
            col("exact_join_size").cast("double"))
        .select(col("join_size_est"), col("exact_join_size"),
          col("over_ratio"))
    },
    Some("""WITH fa AS (SELECT l_partkey AS k FROM lineitem
        WHERE l_partkey IS NOT NULL),
      di AS (SELECT p_partkey AS k FROM part
        WHERE p_size > 45 AND p_partkey IS NOT NULL),
      ca AS (SELECT u.r AS sk_row,
          substr(md5(cast(k AS varchar) || ':cms' || cast(u.r AS varchar)),
            1, 3) AS sk_bucket, count(*) AS cnt
        FROM fa, unnest(generate_series(0, 3)) AS u(r) GROUP BY 1, 2),
      cb AS (SELECT u.r AS sk_row,
          substr(md5(cast(k AS varchar) || ':cms' || cast(u.r AS varchar)),
            1, 3) AS sk_bucket, count(*) AS cnt
        FROM di, unnest(generate_series(0, 3)) AS u(r) GROUP BY 1, 2),
      ip AS (SELECT ca.sk_row,
          cast(sum(ca.cnt * cb.cnt) AS bigint) AS row_ip
        FROM ca JOIN cb USING (sk_row, sk_bucket) GROUP BY 1),
      est AS (SELECT CASE WHEN count(*) < 4 THEN 0
          ELSE cast(min(row_ip) AS bigint) END AS join_size_est FROM ip),
      ex AS (SELECT count(*) AS exact_join_size
        FROM fa JOIN di ON fa.k = di.k)
      SELECT join_size_est, exact_join_size,
        cast(join_size_est AS double) / cast(exact_join_size AS double)
          AS over_ratio
      FROM est, ex"""))

  // ---------------------------------------------------------------- q218
  /** Production count-min family ([[CountMin.sketchFast]]): the
    * xxhash64-bucketed sketch whose build is one codegen'd 8-byte hash
    * per cell instead of q153's md5 digest + hex substring (measured ~5×
    * cheaper at 30×, SCALE.md). xxhash64 is not replayable in DuckDB, so
    * this uses the q134/q181 error-envelope recipe: the EXACT per-word
    * counts are oracled value-for-value, and the sketch's guarantee —
    * estimate ≥ truth, for every probed key — collapses to a boolean
    * column the oracle pins to TRUE. A hash-family bug that ever
    * underestimates flips the boolean and fails the driver gate. */
  val q218CmsFast = Q(
    "q218_cms_fast",
    (s, d) => {
      val docs = Tables.documents(s, d)
      val toks = docs.select(
        explode(filter(split(col("text"), " "), t => t =!= "")).as("word"))
      val sk = CountMin.sketchFast(toks, "word", depth = 4, width = 4096)
      val vocab = Vocabulary.build(docs, "text", n = 25)
      CountMin.estimateFast(sk, vocab, "word", depth = 4, width = 4096)
        .select(col("word"), col("rank").as("vocab_rank"),
          col("n_occurrences"),
          (col("cms_count") >= col("n_occurrences")).as("never_under"))
        .orderBy(col("word"))
    },
    Some("""WITH w AS (SELECT unnest(
          list_filter(string_split(text, ' '), t -> t <> '')) AS word
        FROM documents),
      c AS (SELECT word, count(*) AS n_occurrences FROM w GROUP BY word),
      v AS (SELECT word, n_occurrences, row_number() OVER (
          ORDER BY n_occurrences DESC, word) AS vocab_rank
        FROM c ORDER BY n_occurrences DESC, word LIMIT 25)
      SELECT word, vocab_rank, n_occurrences, true AS never_under
      FROM v ORDER BY word"""))

  // ---------------------------------------------------------------- q221
  /** Quantile-sketch error envelope: Spark's `approx_percentile`
    * (Greenwald–Khanna summaries, mergeable partial sketches — the
    * one-pass answer when an exact global sort-and-rank is the
    * bottleneck) probed at four percentiles of l_extendedprice with
    * accuracy 100. GK's guarantee is DETERMINISTIC — the returned
    * value's rank is within n/accuracy of the target rank, for every
    * merge order — so the guarantee collapses to an always-true boolean
    * per percentile (the q134/q181 envelope recipe: the sketch values
    * themselves are merge-order-dependent and stay out of the hash;
    * the rank bound is not, and a sketch bug flips it). */
  val q221QuantileEnvelope = Q(
    "q221_quantile_envelope",
    (s, d) => {
      import s.implicits._
      val v = Tables.lineitem(s, d).select(col("l_extendedprice").as("x"))
      val ps = Seq(25, 50, 75, 90)
      val acc = 100
      val head = v.agg(
        expr(s"approx_percentile(x, array(${ps.map(_ / 100.0)
          .mkString(",")}), $acc)").as("ap"),
        count(lit(1)).as("n")).collect()(0)
      val ap = head.getSeq[Double](0)
      val n = head.getLong(1)
      val rankCols = ps.zip(ap).map { case (p, value) =>
        F.sum(when(col("x") <= value, 1L).otherwise(0L)).as(s"r$p")
      }
      val ranks = v.agg(rankCols.head, rankCols.tail: _*).collect()(0)
      ps.zipWithIndex.map { case (p, i) =>
        val rank = ranks.getLong(i)
        // GK bound: |rank(v) − p·n| ≤ n/accuracy (+1 for the
        // floor/ceil ambiguity of the target rank)
        (p.toLong, n,
          math.abs(rank - p / 100.0 * n) <= n.toDouble / acc + 1)
      }.toDF("pct", "n", "within_bound").orderBy(col("pct"))
    },
    Some("""WITH n AS (SELECT count(*) AS n FROM lineitem)
      SELECT cast(p.pct AS bigint) AS pct, n.n, true AS within_bound
      FROM (VALUES (25), (50), (75), (90)) p(pct), n ORDER BY pct"""))

  // ---------------------------------------------------------------- q226
  /** Per-group top-10 heavy hitters via the native Misra–Gries
    * aggregate ([[graft.functions.MisraGriesAgg]], the engine's first
    * `TypedImperativeAggregate`): per order-priority, the customers
    * placing the most orders. Capacity 1<<17 exceeds the distinct
    * customer count at oracle scale, so the sketch is provably EXACT
    * and partitioning-invariant (no decrement ever fires — see the
    * aggregate's scaladoc) and the driver hash-matches DuckDB's exact
    * count + window. The sketch array is already (count desc, item
    * asc)-sorted, so `slice(.., 1, 10)` IS the top-10 — no window, no
    * second shuffle; at 100 TB the exchange carries k counters per
    * group instead of the customer domain. */
  val q226HeavyHitters = Q(
    "q226_heavy_hitters",
    (s, d) => {
      graft.functions.GraftFunctions.register(s)
      Tables.orders(s, d)
        .groupBy(col("o_orderpriority").as("prio"))
        .agg(graft.functions.GraftFunctions
          .heavyHitters(col("o_custkey"), 1 << 17).as("hh"))
        .select(col("prio"),
          posexplode(slice(col("hh"), 1, 10)).as(Seq("pos", "e")))
        .select(col("prio"), (col("pos") + 1).cast("long").as("rnk"),
          col("e.item").as("custkey"), col("e.count").as("cnt"))
        .orderBy(col("prio"), col("rnk"))
    },
    Some("""WITH c AS (
        SELECT o_orderpriority AS prio, o_custkey AS custkey,
          count(*) AS cnt
        FROM orders GROUP BY 1, 2),
      r AS (
        SELECT prio, custkey, cnt,
          row_number() OVER (PARTITION BY prio
            ORDER BY cnt DESC, custkey) AS rnk
        FROM c)
      SELECT prio, rnk, custkey, cnt FROM r WHERE rnk <= 10
      ORDER BY prio, rnk"""))

  // ---------------------------------------------------------------- q232
  /** Per-group top-7 / bottom-7 orders by price via the native exact
    * bounded-state aggregate ([[graft.functions.BoundedTopKAgg]]) —
    * the aggregate form of the window row_number <= k idiom. Money
    * snapped to integer cents per [[Q.sqlCents]]'s discipline, item
    * ties broken ascending in both directions, so the result is
    * deterministic and hash-matches DuckDB's two windows. Unlike q226's
    * Misra–Gries this is exact at EVERY k: the exchange carries at most
    * k pairs per group per map partition, and unlike the rank-window
    * form (even with Spark's WindowGroupLimit pushdown) no local sort
    * of the scan ever runs — the heap update is O(log k) per row. */
  val q232TopKAgg = Q(
    "q232_topk_agg",
    (s, d) => {
      graft.functions.GraftFunctions.register(s)
      val o = Tables.orders(s, d).select(
        col("o_orderpriority").as("prio"),
        col("o_orderkey").as("okey"),
        expr("cast(round(o_totalprice * 100) as bigint)").as("cents"))
      o.groupBy("prio")
        .agg(
          graft.functions.GraftFunctions
            .topK(col("okey"), col("cents"), 7).as("hi"),
          graft.functions.GraftFunctions
            .bottomK(col("okey"), col("cents"), 7).as("lo"))
        .select(col("prio"),
          posexplode(arrays_zip(col("hi"), col("lo"))).as(Seq("pos", "e")))
        .select(col("prio"), (col("pos") + 1).cast("long").as("rnk"),
          col("e.hi.item").as("top_key"), col("e.hi.weight").as("top_cents"),
          col("e.lo.item").as("bot_key"), col("e.lo.weight").as("bot_cents"))
        .orderBy(col("prio"), col("rnk"))
    },
    Some("""WITH o AS (
        SELECT o_orderpriority AS prio, o_orderkey AS okey,
          cast(round(o_totalprice * 100) AS bigint) AS cents FROM orders),
      hi AS (SELECT prio, okey, cents, row_number() OVER (
          PARTITION BY prio ORDER BY cents DESC, okey) AS rnk FROM o),
      lo AS (SELECT prio, okey, cents, row_number() OVER (
          PARTITION BY prio ORDER BY cents, okey) AS rnk FROM o)
      SELECT hi.prio, cast(hi.rnk AS bigint) AS rnk, hi.okey AS top_key,
        hi.cents AS top_cents, lo.okey AS bot_key, lo.cents AS bot_cents
      FROM hi JOIN lo ON hi.prio = lo.prio AND hi.rnk = lo.rnk
      WHERE hi.rnk <= 7 ORDER BY hi.prio, hi.rnk"""))

  // ---------------------------------------------------------------- q233
  /** Pairwise audience overlap between order priorities from KMV
    * bottom-k sketches alone ([[graft.operators.Kmv]]): one pass
    * builds a k-bounded `(xxhash64(custkey), custkey)` sketch per
    * priority; every pair's intersection / union then comes from the
    * sketch arrays — the fact table is never rescanned per pair. At
    * k = 1<<17 > the distinct customer count at oracle scale the
    * sketches retain the FULL audience sets (the exact regime the
    * KMV estimator inherits below k — Kmv.distinctEstimate), so the
    * driver hash-matches DuckDB's exact distinct-intersection joins;
    * KmvSpec pins the k < n estimation envelope. The pair stage is a
    * broadcast nested-loop over G sketch rows (G = #groups), state
    * O(G × k) — independent of fact cardinality. */
  val q233AudienceOverlap = Q(
    "q233_audience_overlap",
    (s, d) => {
      graft.functions.GraftFunctions.register(s)
      val pres = Tables.orders(s, d)
        .select(col("o_orderpriority").as("grp"), col("o_custkey").as("uid"))
        .distinct()
      val sk = pres.groupBy("grp")
        .agg(graft.functions.GraftFunctions
          .bottomK(col("uid"), xxhash64(col("uid")), 1 << 17).as("sk"))
        .select(col("grp"),
          expr("transform(sk, e -> e.item)").as("aud"),
          size(col("sk")).cast("long").as("n"))
      val a = sk.select(col("grp").as("grp_a"), col("aud").as("aud_a"),
        col("n").as("n_a"))
      val b = sk.select(col("grp").as("grp_b"), col("aud").as("aud_b"),
        col("n").as("n_b"))
      a.join(broadcast(b), col("grp_a") < col("grp_b"))
        .withColumn("inter_users",
          size(array_intersect(col("aud_a"), col("aud_b"))).cast("long"))
        .select(col("grp_a"), col("grp_b"), col("inter_users"),
          (col("n_a") + col("n_b") - col("inter_users")).as("union_users"))
        .orderBy(col("grp_a"), col("grp_b"))
    },
    Some("""WITH pres AS (
        SELECT DISTINCT o_orderpriority AS grp, o_custkey AS uid
        FROM orders),
      cnt AS (SELECT grp, count(*) AS n FROM pres GROUP BY 1),
      ij AS (SELECT a.grp AS grp_a, b.grp AS grp_b, count(*) AS inter
             FROM pres a JOIN pres b ON a.uid = b.uid AND a.grp < b.grp
             GROUP BY 1, 2)
      SELECT ca.grp AS grp_a, cb.grp AS grp_b,
        coalesce(ij.inter, 0) AS inter_users,
        ca.n + cb.n - coalesce(ij.inter, 0) AS union_users
      FROM cnt ca JOIN cnt cb ON ca.grp < cb.grp
      LEFT JOIN ij ON ij.grp_a = ca.grp AND ij.grp_b = cb.grp
      ORDER BY grp_a, grp_b"""))

  val all: Seq[Q] =
    Seq(q153CmsFrequency, q176BloomJoin, q177BloomAnti, q178BloomStringJoin,
      q206CmsJoinEstimate, q218CmsFast, q221QuantileEnvelope,
      q226HeavyHitters, q232TopKAgg, q233AudienceOverlap)
}
