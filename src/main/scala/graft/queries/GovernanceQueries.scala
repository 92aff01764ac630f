package graft.queries

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.dedup.Clusters
import graft.operators.{FuzzyJoin, Integrity, Survivorship}

/** Data-governance surface: golden-record merge over matched duplicate
  * clusters, and the declarative integrity/quality audit a snapshot runs
  * before publish.
  */
object GovernanceQueries {

  // ---------------------------------------------------------------- q200
  /** The full master-data pipeline in ONE plan: fuzzy match (q196's
    * blocked edit-distance join) → transitive clustering (q145's
    * connected components) → field-level survivorship
    * ([[graft.operators.Survivorship]]): modal market segment, max
    * balance, lexicographic-min name per merged entity. The oracle
    * replays matching brute-force, closure via recursive CTE, and every
    * survivor rule — so the driver gate pins the COMPOSITION, like
    * q148 does for corpus curation. */
  val q200GoldenRecord = Q(
    "q200_golden_record",
    (s, d) => {
      val sample = Tables.customer(s, d)
        .filter(col("c_custkey") % 10 === 0)
      // match rule: name within edit distance 1 AND agreeing segment —
      // the usual fuzzy+blocking-attribute conjunction, which also keeps
      // sequential-id name chains from transitively merging everything
      val seg = sample.select(col("c_custkey").as("sid"),
        col("c_mktsegment").as("sseg"))
      // AutoQ (q196's round-10 100× lesson: pinned q=3 goes degenerate
      // on the grown templated corpus; the measured path self-tunes)
      val pairs = FuzzyJoin.selfJoin(sample, "c_custkey", "c_name", k = 1)
        .join(seg.select(col("sid").as("a_id"), col("sseg").as("seg_a")),
          Seq("a_id"))
        .join(seg.select(col("sid").as("b_id"), col("sseg").as("seg_b")),
          Seq("b_id"))
        .filter(col("seg_a") === col("seg_b"))
        .select(col("a_id").as("id_a"), col("b_id").as("id_b"))
      val comp = Clusters.assign(sample.select(col("c_custkey")),
        "c_custkey", pairs)
      Survivorship.golden(sample, "c_custkey", comp,
          modalFields = Seq("c_mktsegment"),
          maxFields = Seq("c_acctbal"), minFields = Seq("c_name"))
        .select(col("component"), col("n_members"), col("c_mktsegment"),
          col("c_acctbal"), col("c_name"))
        .orderBy(col("component"))
    },
    Some("""WITH RECURSIVE c AS (
        SELECT c_custkey AS id, c_name, c_acctbal, c_mktsegment
        FROM customer WHERE c_custkey % 10 = 0),
      pairs AS (
        SELECT a.id AS id_a, b.id AS id_b FROM c a JOIN c b
        ON a.id < b.id
        WHERE abs(len(a.c_name) - len(b.c_name)) <= 1
          AND levenshtein(a.c_name, b.c_name) <= 1
          AND a.c_mktsegment = b.c_mktsegment),
      edges AS (
        SELECT id_a AS s, id_b AS t FROM pairs
        UNION SELECT id_b, id_a FROM pairs),
      reach(s, t) AS (
        SELECT s, t FROM edges
        UNION
        SELECT r.s, e.t FROM reach r JOIN edges e ON r.t = e.s),
      comp AS (
        SELECT c.id, least(c.id, coalesce(min(r.t), c.id)) AS component
        FROM c LEFT JOIN reach r ON c.id = r.s GROUP BY c.id),
      joined AS (
        SELECT comp.component, c.* FROM c JOIN comp ON c.id = comp.id),
      base AS (
        SELECT component, count(*) AS n_members,
          max(c_acctbal) AS c_acctbal, min(c_name) AS c_name
        FROM joined GROUP BY 1),
      votes AS (
        SELECT component, c_mktsegment, count(*) AS n_votes
        FROM joined WHERE c_mktsegment IS NOT NULL GROUP BY 1, 2),
      modal AS (
        SELECT component, c_mktsegment FROM (
          SELECT component, c_mktsegment, row_number() OVER (
            PARTITION BY component
            ORDER BY n_votes DESC, c_mktsegment) AS rk
          FROM votes) z WHERE rk = 1)
      SELECT b.component, b.n_members, m.c_mktsegment, b.c_acctbal,
        b.c_name
      FROM base b LEFT JOIN modal m USING (component)
      ORDER BY component"""))

  // ---------------------------------------------------------------- q201
  /** Pre-publish integrity audit: four FK-orphan checks, a null check,
    * two policy gates (discount cap, priority whitelist), and two
    * uniqueness checks — nine exact violation counts in one report.
    * The policy gates intentionally flag real rows so the audit's
    * counting path is exercised, not just its zeros. */
  val q201IntegrityAudit = Q(
    "q201_integrity_audit",
    (s, d) => {
      val li = Tables.lineitem(s, d)
      val ord = Tables.orders(s, d)
      Integrity.report(Seq(
        Integrity.fkOrphans("fk_lineitem_orders", li, "l_orderkey",
          ord, "o_orderkey"),
        Integrity.fkOrphans("fk_lineitem_part", li, "l_partkey",
          Tables.part(s, d), "p_partkey"),
        Integrity.fkOrphans("fk_lineitem_supplier", li, "l_suppkey",
          Tables.supplier(s, d), "s_suppkey"),
        Integrity.fkOrphans("fk_orders_customer", ord, "o_custkey",
          Tables.customer(s, d), "c_custkey"),
        Integrity.notNull("nn_events_user", Tables.events(s, d),
          "user_id"),
        Integrity.inRange("policy_discount_cap", li, "l_discount",
          0.0, 0.05),
        Integrity.accepted("policy_priority_named", ord,
          "o_orderpriority",
          Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "5-LOW")),
        Integrity.unique("unique_lineitem_pk", li,
          Seq("l_orderkey", "l_linenumber")),
        Integrity.unique("unique_customer_pk", Tables.customer(s, d),
          Seq("c_custkey"))))
    },
    Some("""SELECT * FROM (
      SELECT 'fk_lineitem_orders' AS "check", count(*) AS violations
        FROM lineitem l WHERE l.l_orderkey IS NOT NULL AND NOT EXISTS (
          SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
      UNION ALL
      SELECT 'fk_lineitem_part', count(*) FROM lineitem l
        WHERE l.l_partkey IS NOT NULL AND NOT EXISTS (
          SELECT 1 FROM part p WHERE p.p_partkey = l.l_partkey)
      UNION ALL
      SELECT 'fk_lineitem_supplier', count(*) FROM lineitem l
        WHERE l.l_suppkey IS NOT NULL AND NOT EXISTS (
          SELECT 1 FROM supplier s WHERE s.s_suppkey = l.l_suppkey)
      UNION ALL
      SELECT 'fk_orders_customer', count(*) FROM orders o
        WHERE o.o_custkey IS NOT NULL AND NOT EXISTS (
          SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
      UNION ALL
      SELECT 'nn_events_user',
        cast(coalesce(sum(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END),
          0) AS bigint) FROM events
      UNION ALL
      SELECT 'policy_discount_cap',
        cast(coalesce(sum(CASE WHEN l_discount < 0.0 OR l_discount > 0.05
          THEN 1 ELSE 0 END), 0) AS bigint) FROM lineitem
      UNION ALL
      SELECT 'policy_priority_named',
        cast(coalesce(sum(CASE WHEN o_orderpriority IN
          ('1-URGENT', '2-HIGH', '3-MEDIUM', '5-LOW') THEN 0 ELSE 1 END),
          0) AS bigint) FROM orders
      UNION ALL
      SELECT 'unique_lineitem_pk',
        (SELECT count(*) FROM lineitem) - (SELECT count(*) FROM (
          SELECT DISTINCT l_orderkey, l_linenumber FROM lineitem) z)
      UNION ALL
      SELECT 'unique_customer_pk',
        (SELECT count(*) FROM customer) - (SELECT count(*) FROM (
          SELECT DISTINCT c_custkey FROM customer) z)
      ) r ORDER BY "check""""))

  // ---------------------------------------------------------------- q270
  /** k-anonymity + l-diversity audit ([[graft.operators.Anonymity]]):
    * is the customer table releasable with (nation, market segment)
    * as quasi-identifiers and the account-balance cents sensitive?
    * One exact hash aggregate on the quasi-identifier key (a sketch
    * would be wrong by construction here — it can claim diversity a
    * class does not have); the risky share is one IEEE division of
    * bigints. */
  val q270AnonymityAudit = Q(
    "q270_anonymity_audit",
    (s, d) => {
      graft.operators.Anonymity.audit(
        Tables.customer(s, d),
        Seq(col("c_nationkey"), col("c_mktsegment")),
        expr("cast(round(c_acctbal * 100) as bigint)"),
        k = 10L, l = 5L)
    },
    Some("""WITH cls AS (SELECT c_nationkey, c_mktsegment,
          cast(count(*) AS bigint) AS sz,
          cast(count(DISTINCT cast(round(c_acctbal * 100) AS bigint))
            AS bigint) AS div
        FROM customer GROUP BY c_nationkey, c_mktsegment)
      SELECT cast(sum(sz) AS bigint) AS n_rows,
        cast(count(*) AS bigint) AS n_classes,
        cast(min(sz) AS bigint) AS min_class_size,
        cast(sum(CASE WHEN sz < 10 THEN 1 ELSE 0 END) AS bigint)
          AS n_classes_below_k,
        cast(sum(CASE WHEN sz < 10 THEN sz ELSE 0 END) AS bigint)
          AS rows_below_k,
        cast(sum(CASE WHEN div < 5 THEN 1 ELSE 0 END) AS bigint)
          AS n_classes_below_l,
        cast(sum(CASE WHEN div < 5 THEN sz ELSE 0 END) AS bigint)
          AS rows_below_l,
        cast(sum(CASE WHEN sz < 10 OR div < 5 THEN sz ELSE 0 END)
          AS bigint) AS rows_risky,
        sum(CASE WHEN sz < 10 OR div < 5 THEN sz ELSE 0 END)
          / sum(sz) AS risky_share
      FROM cls"""))

  def all: Seq[Q] = Seq(q200GoldenRecord, q201IntegrityAudit,
    q270AnonymityAudit)
}
