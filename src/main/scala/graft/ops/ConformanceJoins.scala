package graft.ops

import graft.{Q, Qh, Tables => T}
import org.apache.spark.sql.functions._

/** Conformance queries C11–C17 (SURVEY.md §2.3): join shapes.
  *
  * Scale notes (100 TB posture):
  *  - Dimension tables (region/nation/part/supplier, and customer relative
  *    to lineitem) are explicitly `broadcast()` so the big fact side never
  *    shuffles for them — at 1000 executors that converts an all-to-all
  *    exchange into a map-side hash join.
  *  - The only unavoidable shuffles are fact⋈fact (orders⋈lineitem on the
  *    order key) and the final aggregations, both on their natural keys.
  *  - The non-equi self join (C16) is quadratic by nature and declared on
  *    a genuinely small table; at scale it would be banded first (see
  *    ext.Similarity for the same pattern on embeddings).
  */
object ConformanceJoins {
  import Qh._

  // C11: TPC-H Q5 shape — revenue per nation within one region.
  // Join order is chosen for scale: the region restriction is applied to
  // CUSTOMER first (via two tiny broadcast joins) before the fact side, so
  // no join ever carries another region's rows. Only nation/region are
  // force-broadcast: the restricted customer set is fact-derived (~20% of
  // all customers) — at 100× scale a forced broadcast of it would OOM, so
  // its join is left to the planner/AQE (a broadcast at small SF, a hash
  // shuffle once customer outgrows the threshold).
  val c11 = Q(
    "c11_join_star_agg",
    (s, d) => {
      val regionCust = T.customer(s, d)
        .join(broadcast(T.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(T.region(s, d).filter(col("r_name") === "ASIA")),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("c_custkey"), col("n_name"))
      val rev = T.orders(s, d)
        .join(regionCust, col("c_custkey") === col("o_custkey"))
        .join(T.lineitem(s, d), col("l_orderkey") === col("o_orderkey"))
      rev.groupBy(col("n_name"))
        .agg(dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"))
        .orderBy(col("revenue").desc, col("n_name"))
    },
    Some(s"""SELECT n_name, ${oSum("l_extendedprice * (1 - l_discount)")} AS revenue
      FROM customer
      JOIN orders ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      JOIN nation ON c_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      WHERE r_name = 'ASIA'
      GROUP BY n_name ORDER BY revenue DESC, n_name"""))

  // C12: fact ⋈ broadcast dimension.
  val c12 = Q(
    "c12_join_broadcast_dim",
    (s, d) => T.lineitem(s, d)
      .join(broadcast(T.part(s, d)), col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"))
      .agg(dsum(col("l_quantity")).as("sum_qty"), count(lit(1)).as("n"))
      .orderBy(col("p_brand")),
    Some(s"""SELECT p_brand, ${oSum("l_quantity")} AS sum_qty, COUNT(*) AS n
      FROM lineitem JOIN part ON l_partkey = p_partkey
      GROUP BY p_brand ORDER BY p_brand"""))

  // C13: left outer join; COUNT(o_orderkey) counts only matched rows →
  // customers with zero orders report 0.
  val c13 = Q(
    "c13_join_left_outer",
    (s, d) => T.customer(s, d)
      .join(T.orders(s, d), col("c_custkey") === col("o_custkey"), "left")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("n_orders"))
      .orderBy(col("c_custkey")),
    Some("""SELECT c_custkey, COUNT(o_orderkey) AS n_orders
      FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      GROUP BY c_custkey ORDER BY c_custkey"""))

  // C14: left semi join (EXISTS).
  val c14 = Q(
    "c14_join_semi",
    (s, d) => T.customer(s, d)
      .join(T.orders(s, d).filter(col("o_orderstatus") === "F"),
        col("c_custkey") === col("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"))
      .orderBy(col("c_custkey")),
    Some("""SELECT c_custkey, c_name FROM customer
      WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
      ORDER BY c_custkey"""))

  // C15: left anti join (NOT EXISTS).
  val c15 = Q(
    "c15_join_anti",
    (s, d) => T.customer(s, d)
      .join(T.orders(s, d), col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"))
      .orderBy(col("c_custkey")),
    Some("""SELECT c_custkey, c_name FROM customer
      WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      ORDER BY c_custkey"""))

  // C16: theta/range self join on a small table (non-equi → BNLJ).
  val c16 = Q(
    "c16_join_theta",
    (s, d) => {
      val s1 = T.supplier(s, d).select(
        col("s_suppkey").as("k1"), col("s_nationkey").as("nk1"), col("s_acctbal").as("bal1"))
      val s2 = T.supplier(s, d).select(
        col("s_suppkey").as("k2"), col("s_nationkey").as("nk2"), col("s_acctbal").as("bal2"))
      s1.join(s2, col("nk1") === col("nk2") && col("bal1") < col("bal2"))
        .select(col("k1"), col("k2"), col("bal1"), col("bal2"))
        .orderBy(col("k1"), col("k2"))
    },
    Some("""SELECT s1.s_suppkey AS k1, s2.s_suppkey AS k2,
        s1.s_acctbal AS bal1, s2.s_acctbal AS bal2
      FROM supplier s1 JOIN supplier s2
        ON s1.s_nationkey = s2.s_nationkey AND s1.s_acctbal < s2.s_acctbal
      ORDER BY k1, k2"""))

  // C17: as-of-style correlated aggregate — latest ship date within 60
  // days of the order date; left join keeps orders with no qualifying
  // lineitem (NULL).
  val c17 = Q(
    "c17_join_asof_agg",
    (s, d) => T.orders(s, d)
      .join(T.lineitem(s, d),
        col("l_orderkey") === col("o_orderkey") &&
          col("l_shipdate") <= col("o_orderdate") + expr("INTERVAL 60 DAYS"),
        "left")
      .groupBy(col("o_orderkey"))
      .agg(max(col("l_shipdate")).as("last_ship"))
      .orderBy(col("o_orderkey")),
    Some("""SELECT o_orderkey, MAX(l_shipdate) AS last_ship
      FROM orders LEFT JOIN lineitem
        ON l_orderkey = o_orderkey AND l_shipdate <= o_orderdate + INTERVAL 60 DAY
      GROUP BY o_orderkey ORDER BY o_orderkey"""))

  // C34: true as-of join — latest purchase per user as-of each click,
  // via the scalable union+window formulation (AsOfJoin.join: one hash
  // shuffle, no BNLJ). Oracle: DuckDB's native ASOF LEFT JOIN.
  val c34 = Q(
    "c34_asof_join",
    (s, d) => {
      val ev = T.events(s, d)
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), col("ts"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("value").as("last_purchase_value"))
      AsOfJoin.join(clicks, purchases, "user_id", "ts", "ts",
        Seq("last_purchase_value"))
        .orderBy(col("event_id"))
    },
    Some("""SELECT l.event_id, l.user_id, l.ts, r.value AS last_purchase_value
      FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click') l
      ASOF LEFT JOIN (SELECT user_id, ts, value FROM events WHERE event_type = 'purchase') r
        ON l.user_id = r.user_id AND l.ts >= r.ts
      ORDER BY l.event_id"""))

  // C35: range join via interval banding (RangeJoin.banded) — bucket
  // co-residency bounds the candidate pairs; the exact BETWEEN filters
  // residuals. Oracle: DuckDB's plain range join.
  val c35 = Q(
    "c35_range_join",
    (s, d) => {
      val cust = T.customer(s, d).select(col("c_custkey"), col("c_acctbal"))
      val supp = T.supplier(s, d).select(col("s_suppkey"), col("s_acctbal"),
        (col("s_acctbal") + 1000).as("hi"))
      RangeJoin.banded(cust, supp, "c_acctbal", "s_acctbal", "hi", 1000.0)
        .select(col("c_custkey"), col("s_suppkey"), col("c_acctbal"), col("s_acctbal"))
        .orderBy(col("c_custkey"), col("s_suppkey"))
    },
    Some("""SELECT c_custkey, s_suppkey, c_acctbal, s_acctbal
      FROM customer JOIN supplier
        ON c_acctbal >= s_acctbal AND c_acctbal <= s_acctbal + 1000
      ORDER BY c_custkey, s_suppkey"""))

  // C45: the salted-join skew technique, hash-checked — salting must be
  // pure plumbing: spreading the big side over `factor` synthetic
  // sub-keys and replicating the small side can change NOTHING about the
  // result. The oracle is the PLAIN join, so any salt leak (a __salt
  // column surviving, a dropped/duplicated row, a replication mismatch)
  // breaks the hash. Aggregated per nation to keep the declared result
  // small; the join itself runs at full lineitem width.
  val c45 = Q(
    "c45_salted_join",
    (s, d) => graft.ext.Skew.saltedJoin(
        T.lineitem(s, d).select(col("l_suppkey"), col("l_extendedprice")),
        T.supplier(s, d).select(col("s_suppkey").as("l_suppkey"), col("s_nationkey")),
        Seq("l_suppkey"), factor = 8)
      .groupBy(col("s_nationkey"))
      .agg(Qh.dsum(col("l_extendedprice")).as("revenue"), count(lit(1)).as("n"))
      .orderBy(col("s_nationkey")),
    Some(s"""SELECT s_nationkey, ${Qh.oSum("l_extendedprice")} AS revenue, COUNT(*) AS n
      FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
      GROUP BY s_nationkey ORDER BY s_nationkey"""))

  // C46: FULL OUTER — the join family's remaining flavor (c13 covers
  // LEFT). Both sides are restricted by disjoint-ish predicates so the
  // result exercises all three row classes (matched, left-only,
  // right-only); the null-keyed rows order deterministically on the
  // other side's unique key.
  val c46 = Q(
    "c46_join_full_outer",
    (s, d) => {
      val cust = T.customer(s, d).filter(col("c_custkey") % 3 === 0)
        .select(col("c_custkey"), col("c_name"))
      val ords = T.orders(s, d).filter(col("o_custkey") % 5 < 2)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      ords.join(cust, col("o_custkey") === col("c_custkey"), "full_outer")
        .select(col("o_orderkey"), col("o_custkey"), col("c_custkey"),
          col("c_name"), col("o_totalprice"))
        .orderBy(col("o_orderkey").asc_nulls_first, col("c_custkey").asc_nulls_first)
    },
    Some("""SELECT o_orderkey, o_custkey, c_custkey, c_name, o_totalprice
      FROM (SELECT o_orderkey, o_custkey, o_totalprice FROM orders WHERE o_custkey % 5 < 2) o
      FULL OUTER JOIN (SELECT c_custkey, c_name FROM customer WHERE c_custkey % 3 = 0) c
      ON o_custkey = c_custkey
      ORDER BY o_orderkey NULLS FIRST, c_custkey NULLS FIRST"""))

  val all: Seq[Q] = Seq(c11, c12, c13, c14, c15, c16, c17, c34, c35, c45, c46)
}
