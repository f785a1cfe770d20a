#!/usr/bin/env python3
"""Generate a deterministic sf1-equivalent (~6M lineitem) under /tmp by
10x replication of the read-only sf0.1 tables (TESTDATA.md forbids
touching /root/testdata). Driver-side tooling like oracle_check.py --
never part of the Scala library.

Replication keeps every distribution and join fan-out exact per copy:
keys are offset by copy * (max_key + 1) so copies never collide and
intra-copy joins stay consistent. Text gets a per-copy suffix token
(docs become NEAR-duplicates across copies -- 10-member groups, the
dedup stress shape); embeddings get a small deterministic per-copy
component perturbation (distinct vectors, near-dup structure kept).
region/nation are fixed dimensions and copy through unchanged.
"""
import os
import sys
import duckdb

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_sf1"
COPIES = int(sys.argv[3]) if len(sys.argv) > 3 else 10

os.makedirs(OUT, exist_ok=True)
con = duckdb.connect()
con.execute(f"CREATE TABLE copies AS SELECT UNNEST(range({COPIES})) AS k")


def src(t):
    return f"read_parquet('{SRC}/{t}.parquet')"


def emit(t, sql):
    con.execute(f"COPY ({sql}) TO '{OUT}/{t}.parquet' (FORMAT PARQUET)")
    n = con.execute(f"SELECT COUNT(*) FROM read_parquet('{OUT}/{t}.parquet')").fetchone()[0]
    print(f"{t}: {n} rows")


def off(t, key):
    return con.execute(f"SELECT MAX({key}) + 1 FROM {src(t)}").fetchone()[0]


# fixed dimensions: pass through
for t in ("region", "nation"):
    emit(t, f"SELECT * FROM {src(t)}")

ck = off("customer", "c_custkey")
sk = off("supplier", "s_suppkey")
pk = off("part", "p_partkey")
ok = off("orders", "o_orderkey")
ek = off("events", "event_id")
uk = off("events", "user_id")
dk = off("documents", "doc_id")
vk = off("embeddings", "vec_id")

emit("customer", f"""SELECT c_custkey + k*{ck} AS c_custkey, c_name,
  c_nationkey, c_acctbal, c_mktsegment FROM {src('customer')}, copies""")
emit("supplier", f"""SELECT s_suppkey + k*{sk} AS s_suppkey, s_name,
  s_nationkey, s_acctbal FROM {src('supplier')}, copies""")
emit("part", f"""SELECT p_partkey + k*{pk} AS p_partkey, p_name, p_brand,
  p_type, p_size, p_retailprice FROM {src('part')}, copies""")
emit("orders", f"""SELECT o_orderkey + k*{ok} AS o_orderkey,
  o_custkey + k*{ck} AS o_custkey, o_orderstatus, o_totalprice,
  o_orderdate::TIMESTAMPTZ AS o_orderdate, o_orderpriority FROM {src('orders')}, copies""")
emit("lineitem", f"""SELECT l_orderkey + k*{ok} AS l_orderkey,
  l_partkey + k*{pk} AS l_partkey, l_suppkey + k*{sk} AS l_suppkey,
  l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax,
  l_returnflag, l_linestatus, l_shipdate::TIMESTAMPTZ AS l_shipdate FROM {src('lineitem')}, copies""")
emit("events", f"""SELECT event_id + k*{ek} AS event_id, ts::TIMESTAMPTZ AS ts,
  user_id + k*{uk} AS user_id, event_type, value, props
  FROM {src('events')}, copies""")
# copy 0 keeps the original text; later copies append a distinct token
# (cross-copy docs become near-duplicates, est_sim ~ 1)
emit("documents", f"""SELECT doc_id + k*{dk} AS doc_id,
  CASE WHEN k = 0 THEN text ELSE text || ' copytag' || k END AS text,
  lang, source,
  CASE WHEN k = 0 THEN n_chars ELSE n_chars + length(' copytag' || k) END AS n_chars
  FROM {src('documents')}, copies""")
# deterministic per-copy perturbation keyed on the component value:
# distinct vectors per copy, cosine-near the original (not scale-only)
emit("embeddings", f"""SELECT vec_id + k*{vk} AS vec_id,
  CASE WHEN k = 0 THEN embedding
    ELSE list_transform(embedding, x -> CAST(x +
      ((CAST(floor(ABS(x)*1000) AS BIGINT) * 31 + k * 17) % 21 - 10) * 0.001
      AS FLOAT)) END AS embedding,
  label FROM {src('embeddings')}, copies""")
print(f"done -> {OUT}")
