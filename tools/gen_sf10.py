#!/usr/bin/env python3
"""Stage-2 scale generator: /tmp/graft_sf1 -> ~sf10 (10x sf1) with the
REALISTIC corpus-growth shape. Driver-side tooling only (like
gen_sf1.py / oracle_check.py) -- never part of the Scala library.

Why a second script instead of `gen_sf1.py sf0.1 out 100`: COPIES=100
in one hop makes every near-duplicate family 100 members wide, so LSH
candidate pairs grow as C(100,2)=4950 per family -- quadratic in SF, a
generator artifact, not how corpora scale (family size stays roughly
constant; the NUMBER of families grows). This stage keeps sf1's
10-member families intact and multiplies the number of families by 10:

- keys: offset by copy * (max_key + 1), same scheme as stage 1, so
  intra-copy join fan-out is exact and copies never collide.
- documents: a per-copy token (' zzK') is spliced in after every 3rd
  word. The engine shingles at n=3 words, so insert-free 3-grams are
  1-in-7 of the union and cross-copy TRUE Jaccard ~= 0.14 -- ~6 sigma
  below the minEstSim=0.4 candidate gate at the suite's MinHash k, so
  stage-2 copies are NOT near-duplicate candidates of each other. The
  stage-1 families (texts differing only in a trailing ' copytagN')
  survive the splice with identical prefixes, so each family stays a
  10-member near-dup group. Cost of the splice: token count x1.33 vs
  a pure 10x (recorded with the anchor).
- embeddings: deterministic per-(vec,component,COPY) noise -- the copy
  index is hashed INSIDE (a post-hash shift would make copy j and k
  noise differ by a constant, leaving copy-copy cosine ~0.99) -- of
  amplitude 0.7/component-range, then re-normalize: cos(orig, copy)
  ~= 0.30 and cos(copy_j, copy_k) ~= 0.09, both below the suite's
  0.4-0.45 cosine-dup thresholds, while stage-1 families (cos ~0.995)
  stay intact.
- region/nation fixed dimensions pass through unchanged.
"""
import os
import sys
import duckdb

SRC = sys.argv[1] if len(sys.argv) > 1 else "/tmp/graft_sf1"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_sf10"
COPIES = int(sys.argv[3]) if len(sys.argv) > 3 else 10
# optional 4th arg: comma-separated table subset (e.g. a stage-3 sf100
# corpus for the lifecycle anchors only needs documents/embeddings/
# orders/customer — skipping lineitem/events saves most of the time
# and disk). Default: all tables.
ONLY = set(sys.argv[4].split(",")) if len(sys.argv) > 4 else None

os.makedirs(OUT, exist_ok=True)
con = duckdb.connect()
con.execute(f"CREATE TABLE copies AS SELECT UNNEST(range({COPIES})) AS k")


def src(t):
    return f"read_parquet('{SRC}/{t}.parquet')"


def emit(t, sql):
    if ONLY is not None and t not in ONLY:
        return
    con.execute(f"COPY ({sql}) TO '{OUT}/{t}.parquet' (FORMAT PARQUET)")
    n = con.execute(f"SELECT COUNT(*) FROM read_parquet('{OUT}/{t}.parquet')").fetchone()[0]
    print(f"{t}: {n} rows", flush=True)


def off(t, key):
    return con.execute(f"SELECT MAX({key}) + 1 FROM {src(t)}").fetchone()[0]


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
  o_orderdate, o_orderpriority FROM {src('orders')}, copies""")
emit("lineitem", f"""SELECT l_orderkey + k*{ok} AS l_orderkey,
  l_partkey + k*{pk} AS l_partkey, l_suppkey + k*{sk} AS l_suppkey,
  l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax,
  l_returnflag, l_linestatus, l_shipdate FROM {src('lineitem')}, copies""")
emit("events", f"""SELECT event_id + k*{ek} AS event_id, ts,
  user_id + k*{uk} AS user_id, event_type, value, props
  FROM {src('events')}, copies""")
# splice ' zzK' after every 3rd word for k>0; copy 0 keeps the original
emit("documents", f"""SELECT doc_id + k*{dk} AS doc_id,
  CASE WHEN k = 0 THEN text ELSE array_to_string(
    list_transform(string_split(text, ' '),
      (w, i) -> CASE WHEN i % 3 = 0 THEN w || ' zz' || k ELSE w END), ' ')
  END AS text,
  lang, source,
  CASE WHEN k = 0 THEN n_chars ELSE length(array_to_string(
    list_transform(string_split(text, ' '),
      (w, i) -> CASE WHEN i % 3 = 0 THEN w || ' zz' || k ELSE w END), ' '))
  END AS n_chars
  FROM {src('documents')}, copies""")
# amplitude-0.7 copy-keyed noise + renormalize: cos(orig, copy) ~0.30
emit("embeddings", f"""WITH noisy AS (
  SELECT vec_id + k*{vk} AS vec_id,
    CASE WHEN k = 0 THEN embedding
      ELSE list_transform(embedding,
        (x, i) -> CAST(x + (CAST(hash((vec_id * 64 + i) * 16 + k) % 2001
                             AS BIGINT) - 1000) * 0.0007 AS FLOAT))
    END AS e, label
  FROM {src('embeddings')}, copies)
SELECT vec_id,
  list_transform(e, x -> CAST(x / sqrt(list_sum(list_transform(e, y -> y*y))) AS FLOAT)) AS embedding,
  label FROM noisy""")
print(f"done -> {OUT}")
