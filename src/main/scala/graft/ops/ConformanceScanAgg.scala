package graft.ops

import graft.{Q, Qh, Tables => T}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Conformance queries C1–C10 (SURVEY.md §2.3): scans, projections,
  * filters, and aggregation. All pure DataFrame API — Catalyst pushes
  * the predicates and projections into the parquet scan, and partial
  * (map-side) aggregation comes free from `groupBy().agg()`.
  */
object ConformanceScanAgg {
  import Qh._

  val c01 = Q(
    "c01_scan_project",
    (s, d) => T.region(s, d)
      .select(col("r_regionkey"), col("r_name"))
      .orderBy(col("r_regionkey")),
    Some("SELECT r_regionkey, r_name FROM region ORDER BY r_regionkey"))

  // C2: range + equality predicate mix; pushed to the parquet scan.
  val c02 = Q(
    "c02_filter_pred_mix",
    (s, d) => T.lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast(TimestampType) &&
        col("l_shipdate") < lit("1997-01-01").cast(TimestampType) &&
        col("l_returnflag") === "R")
      .select(col("l_orderkey"), col("l_linenumber"), col("l_shipdate"), col("l_quantity"))
      // ORDER BY every output column: the synthetic lineitem carries
      // duplicate (l_orderkey, l_linenumber) pairs, so the two-key sort
      // is not total — both engines only agreed at small SF because a
      // single-file scan fed their stable sorts the same arrival order
      // (at sf1's multi-row-group file the tie luck breaks). A total
      // order leaves only full-row duplicates tied, and those are
      // hash-interchangeable.
      .orderBy(col("l_orderkey"), col("l_linenumber"), col("l_shipdate"), col("l_quantity")),
    Some("""SELECT l_orderkey, l_linenumber, l_shipdate, l_quantity FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
        AND l_returnflag = 'R'
      ORDER BY l_orderkey, l_linenumber, l_shipdate, l_quantity"""))

  // C3: IN-list filter — mirror of the reference's account-id filter
  // (reference src/sources/aws_cur.py:77-83).
  val c03 = Q(
    "c03_filter_in_list",
    (s, d) => T.orders(s, d)
      .filter(col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
      .select(col("o_orderkey"), col("o_orderpriority"), col("o_totalprice"))
      .orderBy(col("o_orderkey")),
    Some("""SELECT o_orderkey, o_orderpriority, o_totalprice FROM orders
      WHERE o_orderpriority IN ('1-URGENT', '2-HIGH') ORDER BY o_orderkey"""))

  // C4: compound OR/AND predicate — mirror of the per-account region rule
  // (reference src/sources/aws_cur.py:85-106).
  val c04 = Q(
    "c04_filter_compound",
    (s, d) => T.customer(s, d)
      .filter((col("c_mktsegment") === "BUILDING" && col("c_nationkey") < 10) ||
        col("c_custkey").isin(1, 2, 3))
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"), col("c_nationkey"))
      .orderBy(col("c_custkey")),
    Some("""SELECT c_custkey, c_name, c_mktsegment, c_nationkey FROM customer
      WHERE (c_mktsegment = 'BUILDING' AND c_nationkey < 10) OR c_custkey IN (1, 2, 3)
      ORDER BY c_custkey"""))

  // C5: lenient casts — try_cast (null on malformed, the reference's
  // pd.to_numeric(errors="coerce"), normalize.py:105-106) + ts→date.
  val c05 = Q(
    "c05_lenient_casts",
    (s, d) => T.events(s, d)
      .select(col("event_id"),
        expr("try_cast(props AS DOUBLE)").as("props_num"),
        col("ts").cast(DateType).as("d"))
      .orderBy(col("event_id")),
    Some("""SELECT event_id, TRY_CAST(props AS DOUBLE) AS props_num, CAST(ts AS DATE) AS d
      FROM events ORDER BY event_id"""))

  val c06 = Q(
    "c06_global_agg",
    (s, d) => T.lineitem(s, d).agg(
      count(lit(1)).as("n_rows"),
      countDistinct(col("l_partkey")).as("n_parts"),
      min(col("l_shipdate")).as("min_ship"),
      max(col("l_shipdate")).as("max_ship")),
    Some("""SELECT COUNT(*) AS n_rows, COUNT(DISTINCT l_partkey) AS n_parts,
      MIN(l_shipdate) AS min_ship, MAX(l_shipdate) AS max_ship FROM lineitem"""))

  // C7: TPC-H Q1 shape — decimal-cast sums per the §2.3 float rule.
  val c07 = Q(
    "c07_groupby_agg",
    (s, d) => T.lineitem(s, d)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_price"),
        dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("sum_disc_price"),
        davg(col("l_discount")).as("avg_disc"),
        count(lit(1)).as("n"))
      .orderBy(col("l_returnflag"), col("l_linestatus")),
    Some(s"""SELECT l_returnflag, l_linestatus,
      ${oSum("l_quantity")} AS sum_qty,
      ${oSum("l_extendedprice")} AS sum_price,
      ${oSum("l_extendedprice * (1 - l_discount)")} AS sum_disc_price,
      ${oAvg("l_discount")} AS avg_disc,
      COUNT(*) AS n
      FROM lineitem GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus"""))

  val c08 = Q(
    "c08_having",
    (s, d) => T.orders(s, d)
      .groupBy(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"))
      .filter(col("n") > 10)
      .orderBy(col("o_orderstatus"), col("o_orderpriority")),
    Some("""SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n FROM orders
      GROUP BY o_orderstatus, o_orderpriority HAVING COUNT(*) > 10
      ORDER BY o_orderstatus, o_orderpriority"""))

  val c09 = Q(
    "c09_count_distinct",
    (s, d) => T.events(s, d)
      .filter(col("event_type") === "purchase")
      .agg(countDistinct(col("user_id")).as("n_users")),
    Some("SELECT COUNT(DISTINCT user_id) AS n_users FROM events WHERE event_type = 'purchase'"))

  // C10: ROLLUP grouping sets; NULL ordering pinned NULLS FIRST (DuckDB
  // defaults to NULLS LAST on ASC, Spark to NULLS FIRST — so it must be
  // explicit in the declared SQL).
  val c10 = Q(
    "c10_rollup",
    (s, d) => T.orders(s, d)
      .rollup(col("o_orderstatus"), col("o_orderpriority"))
      .agg(
        grouping(col("o_orderstatus")).cast(IntegerType).as("g1"),
        grouping(col("o_orderpriority")).cast(IntegerType).as("g2"),
        dsum(col("o_totalprice")).as("sum_price"),
        count(lit(1)).as("n"))
      .select(col("g1"), col("g2"), col("o_orderstatus"), col("o_orderpriority"),
        col("sum_price"), col("n"))
      .orderBy(col("g1"), col("g2"),
        col("o_orderstatus").asc_nulls_first, col("o_orderpriority").asc_nulls_first),
    Some(s"""SELECT CAST(GROUPING(o_orderstatus) AS INT) AS g1,
      CAST(GROUPING(o_orderpriority) AS INT) AS g2,
      o_orderstatus, o_orderpriority,
      ${oSum("o_totalprice")} AS sum_price, COUNT(*) AS n
      FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
      ORDER BY g1, g2, o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST"""))

  // C42: CUBE — all 2^n grouping-set combinations (c10 covers the
  // hierarchical ROLLUP prefix sets); grouping_id's bit order (first
  // column = MSB) matches DuckDB's GROUPING(), verified empirically.
  val c42 = Q(
    "c42_cube",
    (s, d) => T.orders(s, d)
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(
        grouping_id().cast(IntegerType).as("gid"),
        dsum(col("o_totalprice")).as("sum_price"),
        count(lit(1)).as("n"))
      .select(col("gid"), col("o_orderstatus"), col("o_orderpriority"),
        col("sum_price"), col("n"))
      .orderBy(col("gid"),
        col("o_orderstatus").asc_nulls_first, col("o_orderpriority").asc_nulls_first),
    Some(s"""SELECT CAST(GROUPING(o_orderstatus, o_orderpriority) AS INT) AS gid,
      o_orderstatus, o_orderpriority,
      ${oSum("o_totalprice")} AS sum_price, COUNT(*) AS n
      FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
      ORDER BY gid, o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST"""))

  // C44: explicit GROUPING SETS — the general form behind ROLLUP (c10)
  // and CUBE (c42): a MIXED set list ((status, priority), (priority), ())
  // that neither shorthand can express. Same grouping_id bit order and
  // NULLS FIRST presentation discipline as c42.
  val c44 = Q(
    "c44_grouping_sets",
    (s, d) => T.orders(s, d)
      .groupingSets(
        Seq(Seq(col("o_orderstatus"), col("o_orderpriority")),
          Seq(col("o_orderpriority")), Seq()),
        col("o_orderstatus"), col("o_orderpriority"))
      .agg(
        grouping_id().cast(IntegerType).as("gid"),
        dsum(col("o_totalprice")).as("sum_price"),
        count(lit(1)).as("n"))
      .select(col("gid"), col("o_orderstatus"), col("o_orderpriority"),
        col("sum_price"), col("n"))
      .orderBy(col("gid"),
        col("o_orderstatus").asc_nulls_first, col("o_orderpriority").asc_nulls_first),
    Some(s"""SELECT CAST(GROUPING(o_orderstatus, o_orderpriority) AS INT) AS gid,
      o_orderstatus, o_orderpriority,
      ${oSum("o_totalprice")} AS sum_price, COUNT(*) AS n
      FROM orders
      GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderpriority), ())
      ORDER BY gid, o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST"""))

  // C-layout: the z-order clustering key — equal-width buckets of
  // (l_extendedprice, l_quantity) bit-interleaved into one Morton value
  // (graft.etl.Bucketing.zValue; 8 bits × 2 cols). Every step is either
  // integer bit algebra or a single correctly-rounded IEEE op in pinned
  // order, so the oracle restates it exactly; the LAYOUT effect (files
  // span narrow ranges of both columns after repartitionByRange(zv)) is
  // BucketingSpec's span assertion — here the VALUE is what's declared.
  val c54 = Q(
    "c54_zorder_value",
    (s, d) => {
      val li = T.lineitem(s, d)
      val row = li.agg(
        min(col("l_extendedprice")), max(col("l_extendedprice")),
        min(col("l_quantity")), max(col("l_quantity"))).head()
      val zv = graft.etl.Bucketing.zValue(Seq(
        (col("l_extendedprice"), lit(row.getDouble(0)), lit(row.getDouble(1))),
        (col("l_quantity"), lit(row.getDouble(2)), lit(row.getDouble(3)))))
      // zv joins the sort key: replicated testdata (the sf1 generator)
      // makes (orderkey, linenumber) non-unique, and rows tied on ALL
      // output columns are interchangeable — the order is then total
      li.select(col("l_orderkey"), col("l_linenumber"), zv)
        .orderBy(col("l_orderkey"), col("l_linenumber"), col("zv"))
    },
    Some(s"""WITH b AS (SELECT MIN(l_extendedprice) AS mn_p, MAX(l_extendedprice) AS mx_p,
          MIN(l_quantity) AS mn_q, MAX(l_quantity) AS mx_q FROM lineitem),
      bk AS (SELECT l_orderkey, l_linenumber,
          CASE WHEN mx_p = mn_p THEN 0 ELSE CAST(LEAST(GREATEST(
            FLOOR((l_extendedprice - mn_p) * 256.0 / (mx_p - mn_p)), 0), 255) AS BIGINT) END AS bp,
          CASE WHEN mx_q = mn_q THEN 0 ELSE CAST(LEAST(GREATEST(
            FLOOR((l_quantity - mn_q) * 256.0 / (mx_q - mn_q)), 0), 255) AS BIGINT) END AS bq
        FROM lineitem, b)
      SELECT l_orderkey, l_linenumber,
        CAST(${(0 until 8).flatMap(j => Seq(
          s"(((bp >> $j) & 1) << ${j * 2})",
          s"(((bq >> $j) & 1) << ${j * 2 + 1})")).mkString(" | ")} AS BIGINT) AS zv
      FROM bk ORDER BY l_orderkey, l_linenumber, zv"""))

  val all: Seq[Q] = Seq(c01, c02, c03, c04, c05, c06, c07, c08, c09, c10, c42,
    c44, c54)
}
