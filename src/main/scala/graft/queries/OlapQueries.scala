package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Classic OLAP surface rounding out the window/aggregate family:
  * time-RANGE rolling frames, ROLLUP subtotal lattices, PIVOT
  * crosstabs, and NTILE bucketing. All exact integer outputs, so every
  * oracle is a direct restatement in DuckDB's dialect.
  */
object OlapQueries {

  // ---------------------------------------------------------------- q164
  /** Rolling 7-day activity per user — a RANGE frame over event-time
    * (value-based, not row-based: the frame is "the last 7 DAYS", not
    * "the last N rows", so gaps and bursts are handled correctly). The
    * frame key is the epoch day number, making the window arithmetic
    * pure integers; one user-keyed window sort serves count and sum. */
  val q164RollingRange = Q(
    "q164_rolling_range",
    (s, d) => {
      val day = floor(unix_timestamp(col("ts")) / lit(86400L)).cast("long")
      val w = Window.partitionBy(col("user_id")).orderBy(col("day"))
        .rangeBetween(-6, 0)
      Tables.events(s, d)
        .select(col("user_id"), col("event_id"), day.as("day"),
          round(col("value") * 100).cast("long").as("value_c"))
        .withColumn("n_7d", count(lit(1)).over(w))
        .withColumn("sum_7d", (sum(col("value_c")).over(w) / 100.0))
        .select(col("user_id"), col("event_id"), col("day"),
          col("n_7d"), col("sum_7d"))
        .orderBy(col("user_id"), col("day"), col("event_id"))
    },
    Some("""WITH e AS (SELECT user_id, event_id,
        cast(floor(epoch(ts) / 86400) AS bigint) AS day,
        cast(round(value * 100) AS bigint) AS value_c
      FROM events)
      SELECT user_id, event_id, day,
        count(*) OVER w AS n_7d,
        cast(sum(value_c) OVER w AS bigint) / 100.0 AS sum_7d
      FROM e
      WINDOW w AS (PARTITION BY user_id ORDER BY day
        RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
      ORDER BY user_id, day, event_id"""))

  // ---------------------------------------------------------------- q165
  /** ROLLUP subtotal lattice over (source, lang): per-pair totals,
    * per-source subtotals, and the grand total in ONE pass — Spark plans
    * a single Expand + aggregation, not three scans. `grouping()` flags
    * distinguish real NULLs from subtotal rows, the part naive
    * GROUP BY unions get wrong. */
  val q165Rollup = Q(
    "q165_rollup",
    (s, d) => Tables.documents(s, d)
      .select(col("source"), col("lang"),
        size(filter(split(col("text"), " "), t => t =!= ""))
          .cast("long").as("tok"))
      .rollup(col("source"), col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("tok")).as("n_tokens"),
        grouping(col("source")).cast("long").as("g_source"),
        grouping(col("lang")).cast("long").as("g_lang"))
      .orderBy(col("g_source"), col("g_lang"), col("source"), col("lang")),
    Some("""SELECT source, lang, count(*) AS n_docs,
        cast(sum(len(list_filter(string_split(text, ' '), t -> t <> '')))
          AS bigint) AS n_tokens,
        cast(grouping(source) AS bigint) AS g_source,
        cast(grouping(lang) AS bigint) AS g_lang
      FROM documents GROUP BY ROLLUP (source, lang)
      ORDER BY g_source, g_lang, source, lang"""))

  // ---------------------------------------------------------------- q166
  /** PIVOT crosstab: per-user event counts spread into one column per
    * event type (the report-shaped output). Spark's pivot with an
    * EXPLICIT value list — never the implicit distinct-scan, which adds
    * a blocking pass and makes the output schema data-dependent; the
    * oracle is the standard conditional-aggregation expansion. */
  val q166Pivot = Q(
    "q166_pivot",
    (s, d) => Tables.events(s, d)
      .groupBy(col("user_id"))
      .pivot("event_type", Seq("click", "error", "purchase", "signup",
        "view"))
      .agg(count(lit(1)))
      .na.fill(0L)
      .orderBy(col("user_id")),
    Some("""SELECT user_id,
        count(*) FILTER (event_type = 'click') AS click,
        count(*) FILTER (event_type = 'error') AS error,
        count(*) FILTER (event_type = 'purchase') AS purchase,
        count(*) FILTER (event_type = 'signup') AS signup,
        count(*) FILTER (event_type = 'view') AS view
      FROM events GROUP BY user_id ORDER BY user_id"""))

  // ---------------------------------------------------------------- q167
  /** NTILE quartiles + cumulative rank stats per group: spend quartile
    * within each order priority, plus percent_rank and cume_dist — the
    * remaining rank-family windows (W1–W9 cover row_number/rank/
    * dense_rank/lag/lead/percentile-by-rank). All three share one
    * window sort. Ratios are exact-integer divisions through IEEE
    * doubles, so they hash-match. */
  val q167Ntile = Q(
    "q167_ntile",
    (s, d) => {
      val w = Window.partitionBy(col("o_orderpriority"))
        .orderBy(col("total_c"), col("o_orderkey"))
      Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_orderpriority"),
          round(col("o_totalprice") * 100).cast("long").as("total_c"))
        .withColumn("quartile", ntile(4).over(w).cast("long"))
        .withColumn("pct_rank", percent_rank().over(w))
        .withColumn("cume", cume_dist().over(w))
        .filter(col("o_orderkey") % 10 === 0)
        .select(col("o_orderpriority"), col("o_orderkey"),
          (col("total_c") / 100.0).as("total"), col("quartile"),
          round(col("pct_rank"), 6).as("pct_rank_r"),
          round(col("cume"), 6).as("cume_r"))
        .orderBy(col("o_orderpriority"), col("o_orderkey"))
    },
    Some("""WITH r AS (SELECT o_orderkey, o_orderpriority,
        cast(round(o_totalprice * 100) AS bigint) AS total_c,
        cast(ntile(4) OVER w AS bigint) AS quartile,
        percent_rank() OVER w AS pct_rank,
        cume_dist() OVER w AS cume
      FROM orders
      WINDOW w AS (PARTITION BY o_orderpriority
        ORDER BY cast(round(o_totalprice * 100) AS bigint), o_orderkey))
      SELECT o_orderpriority, o_orderkey, total_c / 100.0 AS total,
        quartile, round(pct_rank, 6) AS pct_rank_r,
        round(cume, 6) AS cume_r
      FROM r WHERE o_orderkey % 10 = 0
      ORDER BY o_orderpriority, o_orderkey"""))

  // ---------------------------------------------------------------- q168
  /** Recency-weighted popularity with EXACT integer decay: each event
    * contributes `2^40 >> age_weeks` mass units (a half-life of one
    * week), so "what's hot now" is a single aggregation whose scores are
    * bit-reproducible — no float pow, no accumulation-order ambiguity.
    * The anchor is the data's own max timestamp (the StatsRange
    * discipline: stats anchor to the data, not the wall clock). Mass
    * for events older than 40 weeks shifts to exactly 0 — the horizon
    * is explicit, not a float underflow. */
  val q168DecayedPopularity = Q(
    "q168_decayed_popularity",
    (s, d) => {
      val ev = Tables.events(s, d)
      val anchor = ev.agg(max(unix_timestamp(col("ts"))))
        .collect()(0).getLong(0) // scalar anchor: one number to the driver
      val age = floor((lit(anchor) - unix_timestamp(col("ts")))
        / lit(604800L)).cast("int")
      ev.select(col("event_type"), age.as("age"))
        // shiftright's Scala binding takes a literal shift; the SQL form
        // accepts a column amount, which the decay needs
        .withColumn("mass",
          expr(s"shiftright(cast(${1L << 40} as bigint), least(age, 62))"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          sum(col("mass")).as("decayed_mass"))
        .orderBy(col("event_type"))
    },
    Some("""WITH a AS (SELECT max(epoch(ts)) AS anchor FROM events),
      m AS (SELECT event_type,
        (cast(1 AS bigint) << 40) >> least(cast(floor(
          ((SELECT anchor FROM a) - epoch(ts)) / 604800) AS int), 62)
          AS mass
      FROM events)
      SELECT event_type, count(*) AS n_events,
        cast(sum(mass) AS bigint) AS decayed_mass
      FROM m GROUP BY event_type ORDER BY event_type"""))

  // ---------------------------------------------------------------- q169
  /** INTERSECT / EXCEPT set algebra (the U-family's missing members):
    * users who both clicked AND purchased, users who clicked but NEVER
    * purchased, with SQL set semantics (distinct). Spark plans these as
    * left-semi/left-anti aggregates — no manual join needed. The union
    * of both with a tag gives one ordered, oracled result. */
  val q169SetAlgebra = Q(
    "q169_set_algebra",
    (s, d) => {
      val ev = Tables.events(s, d)
      def typed(t: String) =
        ev.filter(col("event_type") === t).select(col("user_id"))
      val both = typed("click").intersect(typed("purchase"))
        .withColumn("tag", lit("both"))
      val only = typed("click").except(typed("purchase"))
        .withColumn("tag", lit("click_only"))
      both.unionByName(only).orderBy(col("tag"), col("user_id"))
    },
    Some("""WITH b AS (
        SELECT user_id FROM events WHERE event_type = 'click'
        INTERSECT
        SELECT user_id FROM events WHERE event_type = 'purchase'),
      o AS (
        SELECT user_id FROM events WHERE event_type = 'click'
        EXCEPT
        SELECT user_id FROM events WHERE event_type = 'purchase')
      SELECT user_id, 'both' AS tag FROM b
      UNION ALL
      SELECT user_id, 'click_only' AS tag FROM o
      ORDER BY tag, user_id"""))

  // ---------------------------------------------------------------- q170
  /** UNPIVOT (melt) — q166's inverse: the wide per-user crosstab back to
    * long (user, event_type, n) form, dropping empty cells. Spark's
    * native `unpivot` (stack under the hood — a per-row expand, no
    * shuffle beyond the source agg); the oracle restates it as the
    * filtered union DuckDB's UNPIVOT desugars to. */
  val q170Unpivot = Q(
    "q170_unpivot",
    (s, d) => {
      val types = Seq("click", "error", "purchase", "signup", "view")
      Tables.events(s, d)
        .groupBy(col("user_id"))
        .pivot("event_type", types)
        .agg(count(lit(1)))
        .na.fill(0L)
        .unpivot(Array(col("user_id")),
          types.map(col).toArray, "event_type", "n")
        .filter(col("n") > 0)
        .orderBy(col("user_id"), col("event_type"))
    },
    Some("""SELECT user_id, event_type, count(*) AS n
      FROM events GROUP BY user_id, event_type
      ORDER BY user_id, event_type"""))

  // ---------------------------------------------------------------- q171
  /** Equi-width histogram: order totals binned into 10 equal-width
    * buckets between the data's own min and max — the profiling
    * companion to q147's quantile (equi-depth) path. Bin ids are exact
    * integer arithmetic on cents (`div`), so edges are engine-portable;
    * the top edge closes into the last bin, the textbook rule. */
  val q171Histogram = Q(
    "q171_histogram",
    (s, d) => {
      val cents = round(col("o_totalprice") * 100).cast("long")
      val mm = Tables.orders(s, d)
        .agg(min(cents).as("lo"), max(cents).as("hi")).collect()(0)
      val (lo, hi) = (mm.getLong(0), mm.getLong(1))
      val width = (hi - lo) / 10 + 1 // +1 closes the top edge into bin 9
      Tables.orders(s, d)
        .select(cents.as("c"))
        .withColumn("bin", expr(s"(c - $lo) div $width"))
        .groupBy(col("bin"))
        .agg(count(lit(1)).as("n_orders"),
          (min(col("c")) / 100.0).as("bin_min"),
          (max(col("c")) / 100.0).as("bin_max"))
        .orderBy(col("bin"))
    },
    Some("""WITH c AS (SELECT cast(round(o_totalprice * 100) AS bigint)
          AS c FROM orders),
      mm AS (SELECT min(c) AS lo,
          (max(c) - min(c)) // 10 + 1 AS width FROM c)
      SELECT cast((c - lo) // width AS bigint) AS bin,
        count(*) AS n_orders,
        min(c) / 100.0 AS bin_min, max(c) / 100.0 AS bin_max
      FROM c, mm GROUP BY 1 ORDER BY 1"""))

  // ---------------------------------------------------------------- q187
  /** SCD Type-2 dimension build ([[graft.operators.Scd2.history]]):
    * each user's event-type log collapsed into state RUNS with
    * `[valid_from, valid_to)` validity intervals, per-user version
    * numbers, and the open interval flagged current — the warehouse
    * dimension-history operator that point-in-time feature joins read.
    * Everything is selection and window arithmetic (no floats), so the
    * oracle replays change detection, interval stitching, versions,
    * and flags row-for-row. */
  val q187Scd2History = Q(
    "q187_scd2_history",
    (s, d) => graft.operators.Scd2
      .history(Tables.events(s, d)
          .select(col("user_id"), col("event_type"), col("ts"),
            col("event_id")),
        "user_id", "event_type", "ts", "event_id")
      .orderBy(col("user_id"), col("version")),
    Some("""WITH o AS (SELECT user_id, event_type, ts, event_id,
        lag(event_type) OVER w AS prev,
        row_number() OVER w AS rn
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      c AS (SELECT user_id, event_type, ts, event_id FROM o
        WHERE rn = 1 OR event_type IS DISTINCT FROM prev),
      v AS (SELECT user_id, event_type, ts AS valid_from,
          lead(ts) OVER w2 AS valid_to,
          cast(row_number() OVER w2 AS bigint) AS version
        FROM c
        WINDOW w2 AS (PARTITION BY user_id ORDER BY ts, event_id))
      SELECT user_id, event_type, valid_from, valid_to, version,
        (valid_to IS NULL) AS is_current
      FROM v ORDER BY user_id, version"""))

  // ---------------------------------------------------------------- q212
  /** Incremental SCD2 maintenance ([[graft.operators.Scd2.merge]]):
    * every 7th event arrives as "today's batch"; the prior history
    * rebuilds ONLY the touched keys (from the log restricted to them)
    * and passes every untouched key through. The oracle is q187's FULL
    * recompute over all events — a green row proves incremental ≡ full,
    * including late out-of-order batch events splicing into existing
    * runs (the q139/q207 incremental contract for dimension tables). */
  val q212Scd2Incremental = Q(
    "q212_scd2_incremental",
    (s, d) => {
      val ev = Tables.events(s, d)
        .select(col("user_id"), col("event_type"), col("ts"),
          col("event_id"))
      val prior = ev.filter(col("event_id") % 7 =!= 0)
      val batch = ev.filter(col("event_id") % 7 === 0)
      val historyTable = graft.operators.Scd2.history(
        prior, "user_id", "event_type", "ts", "event_id")
      graft.operators.Scd2.merge(historyTable, prior, batch,
          "user_id", "event_type", "ts", "event_id")
        .orderBy(col("user_id"), col("version"))
    },
    Some("""WITH o AS (SELECT user_id, event_type, ts, event_id,
        lag(event_type) OVER w AS prev,
        row_number() OVER w AS rn
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      c AS (SELECT user_id, event_type, ts, event_id FROM o
        WHERE rn = 1 OR event_type IS DISTINCT FROM prev),
      v AS (SELECT user_id, event_type, ts AS valid_from,
          lead(ts) OVER w2 AS valid_to,
          cast(row_number() OVER w2 AS bigint) AS version
        FROM c
        WINDOW w2 AS (PARTITION BY user_id ORDER BY ts, event_id))
      SELECT user_id, event_type, valid_from, valid_to, version,
        (valid_to IS NULL) AS is_current
      FROM v ORDER BY user_id, version"""))

  // ---------------------------------------------------------------- q188
  /** Robust anomaly gate ([[graft.operators.RobustStats.profile]]):
    * per-event-type median and MAD over exact cents with a
    * `|x − median| > 3·MAD` outlier count — the mean/stddev-free
    * data-quality gate (one corrupted batch cannot shift the
    * thresholds). Lower-median by rank SELECTION (the value at rank
    * `(n+1) div 2`), so every statistic is an exact bigint and the
    * single share division is IEEE-exact. */
  val q188RobustOutliers = Q(
    "q188_robust_outliers",
    (s, d) => graft.operators.RobustStats
      .profile(Tables.events(s, d)
          .select(col("event_type"),
            round(col("value") * 100).cast("long").as("value_c")),
        "event_type", "value_c", k = 3)
      .orderBy(col("event_type")),
    Some("""WITH v AS (SELECT event_type,
        cast(round(value * 100) AS bigint) AS c FROM events),
      r AS (SELECT event_type, c,
          row_number() OVER (PARTITION BY event_type ORDER BY c) AS rn,
          count(*) OVER (PARTITION BY event_type) AS n FROM v),
      med AS (SELECT event_type, n, c AS median FROM r
        WHERE rn = (n + 1) // 2),
      d AS (SELECT v.event_type, n, median, abs(c - median) AS dev
        FROM v JOIN med USING (event_type)),
      r2 AS (SELECT event_type, dev,
          row_number() OVER (PARTITION BY event_type ORDER BY dev) AS rn,
          count(*) OVER (PARTITION BY event_type) AS n2 FROM d),
      mad AS (SELECT event_type, dev AS mad FROM r2
        WHERE rn = (n2 + 1) // 2),
      agg AS (SELECT d.event_type, n, median, mad,
          cast(sum(CASE WHEN dev > 3 * mad THEN 1 ELSE 0 END)
            AS bigint) AS n_outliers
        FROM d JOIN mad USING (event_type) GROUP BY 1, 2, 3, 4)
      SELECT event_type, n, median, mad, n_outliers,
        cast(n_outliers AS double) / cast(n AS double) AS outlier_share
      FROM agg ORDER BY event_type"""))

  // ---------------------------------------------------------------- q190
  /** Peak concurrency sweep ([[graft.operators.Sweep]]): 30-minute-gap
    * sessions per user swept as ±1 breakpoints — the maximum number of
    * simultaneously-active sessions and the first instant it occurs.
    * The global running sum rides [[graft.operators.PrefixSum]] (range
    * exchange + parallel per-partition sorts + broadcast offsets), not
    * a single-partition window; the oracle replays sessionization,
    * breakpoint order (starts before ends at equal instants), the full
    * cumulative sweep, and both peak statistics. */
  val q190PeakConcurrency = Q(
    "q190_peak_concurrency",
    (s, d) => {
      val iv = graft.operators.Sweep.sessions(
        Tables.events(s, d)
          .select(col("user_id"), col("ts"), col("event_id")),
        "user_id", "ts", "event_id", gapSeconds = 1800L)
      graft.operators.Sweep
        .peakConcurrency(iv, "s_start", "s_end",
          Seq("user_id", "session_id"))
        .select(col("peak"), col("first_peak_ts"),
          col("n_intervals").as("n_sessions"))
    },
    Some("""WITH e AS (SELECT user_id, ts, event_id, epoch_us(ts) AS us,
        lag(epoch_us(ts)) OVER (PARTITION BY user_id
          ORDER BY ts, event_id) AS pus FROM events),
      b AS (SELECT user_id, ts, event_id,
        CASE WHEN pus IS NULL OR us - pus <= 1800000000 THEN 0 ELSE 1
          END AS brk FROM e),
      s AS (SELECT user_id, ts, sum(brk) OVER (PARTITION BY user_id
          ORDER BY ts, event_id) AS session_id FROM b),
      iv AS (SELECT user_id, session_id, min(ts) AS s_start,
        max(ts) AS s_end FROM s GROUP BY 1, 2),
      bp AS (SELECT s_start AS t, 0 AS kind, 1 AS delta, user_id,
          session_id FROM iv
        UNION ALL SELECT s_end AS t, 1 AS kind, -1 AS delta, user_id,
          session_id FROM iv),
      r AS (SELECT t, sum(delta) OVER (ORDER BY t, kind, user_id,
          session_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
          AS conc FROM bp),
      p AS (SELECT cast(max(conc) AS bigint) AS peak FROM r)
      SELECT peak,
        (SELECT min(t) FROM r WHERE conc = (SELECT peak FROM p))
          AS first_peak_ts,
        (SELECT count(*) FROM iv) AS n_sessions
      FROM p"""))

  val all: Seq[Q] = Seq(q164RollingRange, q165Rollup, q166Pivot, q167Ntile,
    q168DecayedPopularity, q169SetAlgebra, q170Unpivot, q171Histogram,
    q187Scd2History, q188RobustOutliers, q190PeakConcurrency,
    q212Scd2Incremental)
}
