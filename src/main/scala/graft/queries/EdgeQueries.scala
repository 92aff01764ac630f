package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Tail of the operator inventory: symmetric pair expansion (U4),
  * null-safe equality joins (J11), windowed bool_or flags (W7), true
  * map-typed results (A8). */
object EdgeQueries {

  // ---------------------------------------------------------------- q83
  /** Symmetric pair expansion (U4, similarity/user.py:70-81): directed
    * edges materialized both ways from one undirected pair computation. */
  val q83SymmetricPairs = Q(
    "q83_symmetric_pairs",
    (s, d) => {
      val li = Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_returnflag"))
      val pairs = li.alias("a").join(li.alias("b"),
          col("a.l_orderkey") === col("b.l_orderkey") &&
          col("a.l_returnflag") < col("b.l_returnflag"))
        .groupBy(col("a.l_returnflag").as("f1"),
          col("b.l_returnflag").as("f2"))
        .agg(count(lit(1)).as("n"))
      pairs.unionByName(
          pairs.select(col("f2").as("f1"), col("f1").as("f2"), col("n")))
        .orderBy(col("f1"), col("f2"))
    },
    Some("""WITH pairs AS (
        SELECT a.l_returnflag AS f1, b.l_returnflag AS f2, count(*) AS n
        FROM lineitem a JOIN lineitem b
        ON a.l_orderkey = b.l_orderkey AND a.l_returnflag < b.l_returnflag
        GROUP BY 1, 2)
      SELECT f1, f2, n FROM pairs
      UNION ALL SELECT f2, f1, n FROM pairs
      ORDER BY f1, f2"""))

  // ---------------------------------------------------------------- q84
  /** Null-safe equality join (J11): keys containing nulls matched with
    * `<=>` (≡ IS NOT DISTINCT FROM) — the manual OR-IS-NULL dance of
    * artist_evolution_activity.py:117-120 done natively. Null keys are
    * manufactured with nullif since the synthetic data is null-free. */
  val q84NullsafeJoin = Q(
    "q84_nullsafe_join",
    (s, d) => {
      val ev = Tables.events(s, d)
        .select(col("user_id"), nullif(col("event_type"), lit("error")).as("k"))
      val keyCounts = ev.groupBy(col("k").as("kc_k"))
        .agg(count(lit(1)).as("key_total"))
      ev.join(keyCounts, col("k") <=> col("kc_k"))
        .groupBy(col("k"), col("key_total"))
        .agg(countDistinct(col("user_id")).as("n_users"))
        .orderBy(col("k"))
    },
    Some("""SELECT e.k AS k, kc.key_total, count(DISTINCT e.user_id) AS n_users
      FROM (SELECT user_id, nullif(event_type, 'error') AS k FROM events) e
      JOIN (SELECT nullif(event_type, 'error') AS k, count(*) AS key_total
        FROM events GROUP BY 1) kc
      ON e.k IS NOT DISTINCT FROM kc.k
      GROUP BY e.k, kc.key_total ORDER BY e.k NULLS FIRST"""))

  // ---------------------------------------------------------------- q85
  /** Windowed boolean flag (W7, similarity/artist.py:28-36): per (user,
    * day) an any-match flag over the whole partition — "did this user have
    * a high-value event that day" — attached to every row then aggregated. */
  val q85BoolOrWindow = Q(
    "q85_bool_or_window",
    (s, d) => {
      val w = Window.partitionBy(col("user_id"), to_date(col("ts")).as("day"))
      Tables.events(s, d)
        .withColumn("day", to_date(col("ts")))
        .withColumn("had_big",
          max(when(col("value") > 150, 1).otherwise(0))
            .over(Window.partitionBy(col("user_id"), col("day"))) === 1)
        .groupBy(col("user_id"))
        .agg(sum(when(col("had_big"), 1L).otherwise(0L)).as("events_on_big_days"),
          count(lit(1)).as("n_events"))
        .orderBy(col("user_id"))
    },
    Some("""SELECT user_id,
      cast(sum(CASE WHEN had_big THEN 1 ELSE 0 END) as bigint)
        AS events_on_big_days,
      count(*) AS n_events
      FROM (SELECT user_id,
        bool_or(value > 150) OVER (
          PARTITION BY user_id, ts::date) AS had_big
      FROM events) t GROUP BY user_id ORDER BY user_id"""))

  // ---------------------------------------------------------------- q86
  /** True map-typed result via map_from_entries (A8,
    * most_listened_year.py:40-44): per user, event_type → count map. The
    * map is genuinely constructed (map_from_entries over sorted entries),
    * then canonicalized back to an entry string via map_entries — the
    * driver's pandas comparator can't hash map columns. */
  val q86MapResult = Q(
    "q86_map_result",
    (s, d) => Tables.events(s, d)
      .groupBy(col("user_id"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
      .groupBy(col("user_id"))
      .agg(map_from_entries(
        sort_array(collect_list(struct(col("event_type"), col("cnt")))))
        .as("m"))
      .select(col("user_id"),
        array_join(transform(map_entries(col("m")),
          x => concat_ws("=", x("key"), x("value").cast("string"))), "|")
          .as("type_counts"))
      .orderBy(col("user_id")),
    Some("""SELECT user_id, array_to_string(list_transform(
        list_sort(list(struct_pack(k := event_type, v := cnt))),
        x -> x.k || '=' || x.v), '|') AS type_counts
      FROM (SELECT user_id, event_type, count(*) AS cnt FROM events
        GROUP BY 1, 2) t GROUP BY user_id ORDER BY user_id"""))

  val all: Seq[Q] = Seq(
    q83SymmetricPairs, q84NullsafeJoin, q85BoolOrWindow, q86MapResult)
}
