package graft.ops

import graft.{Q, Qh, Tables => T}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Conformance queries C22–C30 (SURVEY.md §2.3): sort/limit/set ops and
  * the scalar-function surface (string/date/math/json/array/map).
  */
object ConformanceSqlFns {
  import Qh._

  // C22: multi-key mixed-direction sort + LIMIT/OFFSET (mirror of the
  // reference's pagination, aws_cur.py:201-219 — here a single logical
  // op, not a rescan loop).
  val c22 = Q(
    "c22_sort_limit_offset",
    (s, d) => T.orders(s, d)
      .select(col("o_orderkey"), col("o_totalprice"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .offset(10).limit(50),
    Some("""SELECT o_orderkey, o_totalprice FROM orders
      ORDER BY o_totalprice DESC, o_orderkey LIMIT 50 OFFSET 10"""))

  // C23: UNION ALL + literal source tagging — the `costs` view shape
  // (reference normalize.py:138, main.py:124-132).
  val c23 = Q(
    "c23_union_all_tagged",
    (s, d) => {
      val a = T.events(s, d).filter(col("event_type") === "click")
        .select(col("event_id"), col("ts"), col("value"), lit("a").as("source_table"))
      val b = T.events(s, d).filter(col("event_type") === "view")
        .select(col("event_id"), col("ts"), col("value"), lit("b").as("source_table"))
      a.unionByName(b).orderBy(col("source_table"), col("event_id"))
    },
    Some("""SELECT * FROM (
        SELECT event_id, ts, value, 'a' AS source_table FROM events WHERE event_type = 'click'
        UNION ALL
        SELECT event_id, ts, value, 'b' AS source_table FROM events WHERE event_type = 'view'
      ) ORDER BY source_table, event_id"""))

  // C24: UNION (distinct) / INTERSECT / EXCEPT, tagged and stacked.
  val c24 = Q(
    "c24_set_ops",
    (s, d) => {
      val c = T.customer(s, d).select(col("c_nationkey").as("k"))
      val sp = T.supplier(s, d).select(col("s_nationkey").as("k"))
      val u = c.union(sp).distinct().select(lit("union").as("op"), col("k"))
      val i = c.intersect(sp).select(lit("intersect").as("op"), col("k"))
      val e = c.except(sp).select(lit("except").as("op"), col("k"))
      u.unionByName(i).unionByName(e).orderBy(col("op"), col("k"))
    },
    Some("""SELECT 'union' AS op, k FROM (SELECT c_nationkey AS k FROM customer UNION SELECT s_nationkey FROM supplier)
      UNION ALL
      SELECT 'intersect' AS op, k FROM (SELECT c_nationkey AS k FROM customer INTERSECT SELECT s_nationkey FROM supplier)
      UNION ALL
      SELECT 'except' AS op, k FROM (SELECT c_nationkey AS k FROM customer EXCEPT SELECT s_nationkey FROM supplier)
      ORDER BY op, k"""))

  // C25: string functions, incl. the reference's identifier-cleaning
  // chain lower ∘ replace('/',':','-',' ','.' → '_')
  // (reference postgresql.py:109-123) applied to data.
  val c25 = Q(
    "c25_string_fns",
    (s, d) => T.part(s, d)
      .select(col("p_partkey"),
        lower(col("p_name")).as("lo"),
        upper(col("p_brand")).as("up"),
        trim(concat(lit(" "), col("p_name"), lit(" "))).as("tr"),
        regexp_replace(col("p_type"), " ", "_").as("rep"),
        substring(col("p_name"), 1, 5).as("sub"),
        length(col("p_name")).cast(LongType).as("len"),
        element_at(split(col("p_name"), " "), 1).as("first_word"),
        regexp_extract(col("p_name"), "([a-z]+)", 1).as("rex"),
        regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(
          lower(concat(col("p_brand"), lit(" "), col("p_type"))),
          "/", "_"), ":", "_"), "-", "_"), " ", "_"), "\\.", "_").as("ident"))
      .orderBy(col("p_partkey")),
    Some("""SELECT p_partkey,
        LOWER(p_name) AS lo, UPPER(p_brand) AS up,
        TRIM(CONCAT(' ', p_name, ' ')) AS tr,
        REPLACE(p_type, ' ', '_') AS rep,
        SUBSTRING(p_name, 1, 5) AS sub,
        CAST(LENGTH(p_name) AS BIGINT) AS len,
        SPLIT_PART(p_name, ' ', 1) AS first_word,
        REGEXP_EXTRACT(p_name, '([a-z]+)', 1) AS rex,
        REPLACE(REPLACE(REPLACE(REPLACE(REPLACE(
          LOWER(CONCAT(p_brand, ' ', p_type)),
          '/', '_'), ':', '_'), '-', '_'), ' ', '_'), '.', '_') AS ident
      FROM part ORDER BY p_partkey"""))

  // C26: date/time functions; fixed literal anchor dates (never
  // CURRENT_DATE) for reproducibility.
  val c26 = Q(
    "c26_date_fns",
    (s, d) => T.orders(s, d)
      .select(col("o_orderkey"),
        date_trunc("month", col("o_orderdate")).as("mon"),
        year(col("o_orderdate")).as("yr"),
        month(col("o_orderdate")).as("mo"),
        dayofmonth(col("o_orderdate")).as("dom"),
        date_add(to_date(col("o_orderdate")), 30).as("plus30"),
        date_sub(to_date(col("o_orderdate")), 30).as("minus30"),
        datediff(lit("1998-01-01").cast(DateType), to_date(col("o_orderdate")))
          .cast(LongType).as("days_to_98"),
        unix_timestamp(col("o_orderdate")).as("epoch_s"))
      .orderBy(col("o_orderkey")),
    Some("""SELECT o_orderkey,
        DATE_TRUNC('month', o_orderdate) AS mon,
        CAST(YEAR(o_orderdate) AS INT) AS yr,
        CAST(MONTH(o_orderdate) AS INT) AS mo,
        CAST(DAY(o_orderdate) AS INT) AS dom,
        CAST(o_orderdate AS DATE) + 30 AS plus30,
        CAST(o_orderdate AS DATE) - 30 AS minus30,
        DATE_DIFF('day', CAST(o_orderdate AS DATE), DATE '1998-01-01') AS days_to_98,
        CAST(FLOOR(EPOCH(o_orderdate)) AS BIGINT) AS epoch_s
      FROM orders ORDER BY o_orderkey"""))

  // C27: math + conditional functions.
  val c27 = Q(
    "c27_math_cond_fns",
    (s, d) => T.lineitem(s, d)
      .select(col("l_orderkey"), col("l_linenumber"),
        round(col("l_extendedprice"), 2).as("rnd"),
        floor(col("l_quantity")).as("flr"),
        ceil(col("l_quantity")).as("cl"),
        abs(col("l_discount") - 0.05).as("ab"),
        when(col("l_quantity") > 25, "high").otherwise("low").as("qty_band"),
        coalesce(nullif(col("l_returnflag"), lit("N")), lit("none")).as("flag_or_none"),
        greatest(col("l_tax"), col("l_discount")).as("gst"),
        least(col("l_tax"), col("l_discount")).as("lst"))
      // total order (duplicate (okey, lineno) pairs exist in the
      // synthetic data — see c02): every output column participates so
      // only hash-interchangeable full-row duplicates remain tied
      .orderBy(col("l_orderkey"), col("l_linenumber"), col("rnd"), col("ab"),
        col("qty_band"), col("flag_or_none"), col("gst"), col("lst"),
        col("flr"), col("cl")),
    Some("""SELECT l_orderkey, l_linenumber,
        ROUND(l_extendedprice, 2) AS rnd,
        CAST(FLOOR(l_quantity) AS BIGINT) AS flr,
        CAST(CEIL(l_quantity) AS BIGINT) AS cl,
        ABS(l_discount - 0.05) AS ab,
        CASE WHEN l_quantity > 25 THEN 'high' ELSE 'low' END AS qty_band,
        COALESCE(NULLIF(l_returnflag, 'N'), 'none') AS flag_or_none,
        GREATEST(l_tax, l_discount) AS gst,
        LEAST(l_tax, l_discount) AS lst
      FROM lineitem ORDER BY l_orderkey, l_linenumber, rnd, ab,
        qty_band, flag_or_none, gst, lst, flr, cl"""))

  // C28: JSON extraction (events.props = {"k": <int>}) + grouped sum.
  val c28 = Q(
    "c28_json",
    (s, d) => T.events(s, d)
      .select(col("event_type"),
        get_json_object(col("props"), "$.k").cast(IntegerType).as("k"))
      .groupBy(col("event_type"))
      .agg(sum(col("k")).as("sum_k"), count(lit(1)).as("n"))
      .orderBy(col("event_type")),
    Some("""SELECT event_type,
        CAST(SUM(TRY_CAST(json_extract_string(props, '$.k') AS INTEGER)) AS BIGINT) AS sum_k,
        COUNT(*) AS n
      FROM events GROUP BY event_type ORDER BY event_type"""))

  // C29: array functions over embeddings (ArrayType(FloatType), 64-dim).
  // Dot product via higher-order functions: per-element f32→f64 cast is
  // exact and both engines accumulate left-to-right in f64 → bit-equal.
  val c29 = Q(
    "c29_array_fns",
    (s, d) => T.embeddings(s, d)
      .filter(col("vec_id") <= 20)
      .select(col("vec_id"),
        size(col("embedding")).as("dim"),
        element_at(col("embedding"), 1).as("e1"),
        aggregate(
          zip_with(col("embedding"), col("embedding"),
            (x, y) => x.cast(DoubleType) * y.cast(DoubleType)),
          lit(0.0), (acc, x) => acc + x).as("norm2"))
      .orderBy(col("vec_id")),
    Some("""SELECT vec_id,
        CAST(LEN(embedding) AS INT) AS dim,
        embedding[1] AS e1,
        LIST_SUM(LIST_TRANSFORM(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) AS norm2
      FROM embeddings WHERE vec_id <= 20 ORDER BY vec_id"""))

  // C30: MapType/StructType round-trip — build, then extract back to
  // scalars (covers the raw-CUR tag-column capability). The oracle states
  // the algebraically-equivalent result of the round-trip.
  val c30 = Q(
    "c30_map_struct",
    (s, d) => T.events(s, d)
      .select(col("event_id"),
        map(lit("provider"), lit("aws"), lit("etype"), col("event_type")).as("m"),
        struct(col("event_type").as("t"), col("value").as("v")).as("st"))
      .select(col("event_id"),
        col("m").getItem("provider").as("provider"),
        col("m").getItem("etype").as("etype"),
        col("st").getField("t").as("st_type"),
        col("st").getField("v").as("st_value"))
      .orderBy(col("event_id")),
    Some("""SELECT event_id, 'aws' AS provider, event_type AS etype,
        event_type AS st_type, value AS st_value
      FROM events ORDER BY event_id"""))

  // C36: pivot — wide per-key aggregation with an explicit value list
  // (explicit so the plan needs no distinct-values pre-pass); decimal
  // float rule applies per cell. Oracle: FILTERed aggregates.
  val c36 = Q(
    "c36_pivot",
    (s, d) => T.events(s, d)
      .groupBy(col("user_id"))
      .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
      .agg(dsum(col("value")))
      .orderBy(col("user_id")),
    Some(s"""SELECT user_id,
        ${Seq("click", "error", "purchase", "signup", "view").map(t =>
          s"CAST(SUM(CAST(value AS DECIMAL(38,6))) FILTER (event_type = '$t') AS DOUBLE) AS $t")
          .mkString(",\n        ")}
      FROM events GROUP BY user_id ORDER BY user_id"""))

  // C37: generator surface — posexplode of a tokenized column (the
  // LATERAL VIEW shape). Oracle: UNNEST over an index range.
  val c37 = Q(
    "c37_explode_tokens",
    (s, d) => T.documents(s, d)
      .filter(col("doc_id") < 50)
      .select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("pos", "tok")))
      .orderBy(col("doc_id"), col("pos")),
    Some("""SELECT doc_id, CAST(t.i - 1 AS INT) AS pos, ws[t.i] AS tok
      FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents WHERE doc_id < 50) d,
           UNNEST(range(1, len(ws) + 1)) AS t(i)
      ORDER BY doc_id, pos"""))

  // C41: unpivot/melt — the inverse of C36's pivot: wide measure columns
  // to (measure, value) rows via Dataset.unpivot (Spark's melt API;
  // plans as a Generate/Expand, no shuffle). Oracle: the UNION ALL
  // restatement. Declared on a keyed slice with a total order.
  val c41 = Q(
    "c41_unpivot",
    (s, d) => T.lineitem(s, d)
      .filter(col("l_orderkey") < 1000)
      .unpivot(
        Array(col("l_orderkey"), col("l_linenumber")),
        Array(col("l_discount").as("disc"), col("l_extendedprice").as("price"),
          col("l_quantity").as("qty")),
        "measure", "value")
      // total order (duplicate (okey, lineno) pairs — see c02): value
      // joins the sort so same-measure ties resolve identically on
      // both engines
      .orderBy(col("l_orderkey"), col("l_linenumber"), col("measure"), col("value")),
    Some("""SELECT l_orderkey, l_linenumber, m AS measure, v AS value FROM (
        SELECT l_orderkey, l_linenumber, 'disc' AS m, l_discount AS v
          FROM lineitem WHERE l_orderkey < 1000
        UNION ALL SELECT l_orderkey, l_linenumber, 'price', l_extendedprice
          FROM lineitem WHERE l_orderkey < 1000
        UNION ALL SELECT l_orderkey, l_linenumber, 'qty', l_quantity
          FROM lineitem WHERE l_orderkey < 1000)
      ORDER BY l_orderkey, l_linenumber, measure, value"""))

  // C48: correlated subqueries — the SQL-surface family the declared
  // set didn't yet cover: a correlated SCALAR aggregate subquery
  // (Catalyst decorrelates it into a join under the hood) and a
  // correlated EXISTS (planned as a semi join), in one statement. The
  // scalar aggregate uses the decimal-sum float rule so the per-customer
  // mean is order-independent on both engines.
  val c48 = Q(
    "c48_correlated_subquery",
    (s, d) => {
      graft.Tables.registerAll(s, d)
      s.sql("""SELECT o.o_orderkey, o.o_totalprice,
          o.o_totalprice - (SELECT CAST(SUM(CAST(o2.o_totalprice AS DECIMAL(38,6))) AS DOUBLE)
                              / COUNT(*)
                            FROM orders o2 WHERE o2.o_custkey = o.o_custkey) AS vs_cust_avg
        FROM orders o
        WHERE o.o_orderkey <= 2000
          AND EXISTS (SELECT 1 FROM lineitem l
                      WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity > 45)
        ORDER BY o.o_orderkey""")
    },
    Some("""SELECT o.o_orderkey, o.o_totalprice,
        o.o_totalprice - (SELECT CAST(SUM(CAST(o2.o_totalprice AS DECIMAL(38,6))) AS DOUBLE)
                            / COUNT(*)
                          FROM orders o2 WHERE o2.o_custkey = o.o_custkey) AS vs_cust_avg
      FROM orders o
      WHERE o.o_orderkey <= 2000
        AND EXISTS (SELECT 1 FROM lineitem l
                    WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity > 45)
      ORDER BY o.o_orderkey"""))

  // C49: LATERAL correlated subquery — the per-row top-k join shape
  // (for each customer, their single most expensive order). Catalyst
  // plans the decorrelated lateral as a join + per-key limit; DuckDB
  // runs the same ANSI LATERAL. Unique (o_totalprice, o_orderkey)
  // ordering keeps the picked row deterministic on both engines.
  val c49 = Q(
    "c49_lateral_topk",
    (s, d) => {
      graft.Tables.registerAll(s, d)
      s.sql("""SELECT c.c_custkey, c.c_name, t.o_orderkey, t.o_totalprice
        FROM customer c,
        LATERAL (SELECT o.o_orderkey, o.o_totalprice FROM orders o
                 WHERE o.o_custkey = c.c_custkey
                 ORDER BY o.o_totalprice DESC, o.o_orderkey LIMIT 1) t
        WHERE c.c_custkey <= 500
        ORDER BY c.c_custkey""")
    },
    Some("""SELECT c.c_custkey, c.c_name, t.o_orderkey, t.o_totalprice
      FROM customer c,
      LATERAL (SELECT o.o_orderkey, o.o_totalprice FROM orders o
               WHERE o.o_custkey = c.c_custkey
               ORDER BY o.o_totalprice DESC, o.o_orderkey LIMIT 1) t
      WHERE c.c_custkey <= 500
      ORDER BY c.c_custkey"""))

  // C52: RECURSIVE CTE (Spark 4's WITH RECURSIVE, UNION ALL recursion) —
  // the calendar-spine pattern: generate every month between the
  // corpus's first and last order date by recursion (80 levels, under
  // the engine's default 100-level limit), then left-join monthly order
  // totals so gap months surface as zeros instead of vanishing. The
  // upper bound rides as a recursion COLUMN from a one-row anchor — a
  // scalar subquery in the recursive step would be re-evaluated at
  // EVERY level (80 extra scans of orders: measured 12 s vs ~1 s at
  // sf0.1). The oracle replays the identical spine with DuckDB's own
  // recursion (+ INTERVAL 1 MONTH ≡ add_months on month starts).
  val c52 = Q(
    "c52_recursive_month_spine",
    (s, d) => {
      T.orders(s, d).createOrReplaceTempView("orders")
      s.sql(s"""WITH RECURSIVE months(m, hi) AS (
          SELECT CAST(date_trunc('MONTH', MIN(o_orderdate)) AS DATE),
                 CAST(date_trunc('MONTH', MAX(o_orderdate)) AS DATE)
          FROM orders
          UNION ALL
          SELECT add_months(m, 1), hi FROM months WHERE m < hi),
        agg AS (SELECT CAST(date_trunc('MONTH', o_orderdate) AS DATE) AS m,
            COUNT(*) AS n_orders, ${oSum("o_totalprice")} AS total
          FROM orders GROUP BY 1)
        SELECT months.m AS month, COALESCE(agg.n_orders, 0) AS n_orders,
          COALESCE(agg.total, CAST(0 AS DOUBLE)) AS total
        FROM months LEFT JOIN agg ON agg.m = months.m
        ORDER BY month""")
    },
    Some(s"""WITH RECURSIVE months(m, hi) AS (
        SELECT CAST(date_trunc('month', MIN(o_orderdate)) AS DATE),
               CAST(date_trunc('month', MAX(o_orderdate)) AS DATE)
        FROM orders
        UNION ALL
        SELECT CAST(m + INTERVAL 1 MONTH AS DATE), hi FROM months WHERE m < hi),
      agg AS (SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS m,
          COUNT(*) AS n_orders, ${oSum("o_totalprice")} AS total
        FROM orders GROUP BY 1)
      SELECT months.m AS month, COALESCE(agg.n_orders, 0) AS n_orders,
        COALESCE(agg.total, CAST(0 AS DOUBLE)) AS total
      FROM months LEFT JOIN agg ON agg.m = months.m
      ORDER BY month"""))

  // C58: EXACT distributed quantiles per group — `percentile` is a
  // sort-based TypedImperativeAggregate (the per-group value multiset is
  // buffered and interpolated at rank p·(n−1)), the capability
  // approx_percentile trades away. Both engines interpolate
  // v[⌊h⌋] + (h−⌊h⌋)·(v[⌊h⌋+1]−v[⌊h⌋]) at h = p·(n−1) on the sorted
  // values, so the doubles are bit-equal and the hash pins the whole
  // rank arithmetic. Scale note: exact quantiles buffer each group's
  // values on its reducer — correct tool for bounded groups (daily/key
  // profiles); unbounded groups take the sketch path (e71's KMV /
  // approx_percentile), the same bounded-state rule as graft_topk.
  val c58 = Q(
    "c58_group_quantiles",
    (s, d) => T.events(s, d)
      .groupBy(col("event_type"))
      .agg(
        expr("percentile(value, 0.25)").as("p25"),
        expr("percentile(value, 0.5)").as("p50"),
        expr("percentile(value, 0.9)").as("p90"),
        count(lit(1)).as("n"))
      .orderBy(col("event_type")),
    Some("""SELECT event_type,
        quantile_cont(value, 0.25) AS p25,
        quantile_cont(value, 0.5) AS p50,
        quantile_cont(value, 0.9) AS p90,
        COUNT(*) AS n
      FROM events GROUP BY event_type ORDER BY event_type"""))

  val all: Seq[Q] = Seq(c22, c23, c24, c25, c26, c27, c28, c29, c30, c36, c37, c41,
    c48, c49, c52, c58)
}
