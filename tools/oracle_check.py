#!/usr/bin/env python3
"""Local mirror of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/oracle_check.py <sfDir> <verifyOutDir>

For each query dir under <verifyOutDir>: load the Spark parquet result,
run the oracle SQL (from oracle_sql.json) in DuckDB over the same testdata
tables, sort columns by name, and compare values exactly (floats bit-for-
bit). Queries without an oracle get a rows-only report.

Dev-tool only (driver-side python: duckdb/pyarrow/pandas). Not part of the
Spark library.
"""
import json
import sys
from pathlib import Path

import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    # timestamps → naive UTC micros; dates stay dates
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            s = df[c]
            if getattr(s.dt, "tz", None) is not None:
                s = s.dt.tz_convert("UTC").dt.tz_localize(None)
            df[c] = s.astype("datetime64[us]")
    return df.reset_index(drop=True)


def compare(a: pd.DataFrame, b: pd.DataFrame) -> str:
    if list(a.columns) != list(b.columns):
        return f"SCHEMA cols spark={list(a.columns)} oracle={list(b.columns)}"
    if len(a) != len(b):
        return f"ROWS spark={len(a)} oracle={len(b)}"
    for c in a.columns:
        av, bv = a[c], b[c]
        # The driver's gate hashes raw values, so an int64 column on one
        # side vs float64 on the other (e.g. DuckDB HUGEINT -> pandas
        # float64) hash-mismatches even when values are numerically
        # equal. Mirror that strictness here instead of coercing.
        if pd.api.types.is_integer_dtype(av) != pd.api.types.is_integer_dtype(bv) and (
                pd.api.types.is_numeric_dtype(av) and pd.api.types.is_numeric_dtype(bv)):
            return (f"DTYPE col={c} spark={av.dtype} oracle={bv.dtype} "
                    "(int/float crossing would hash-mismatch in the driver)")
        if pd.api.types.is_float_dtype(av) or pd.api.types.is_float_dtype(bv):
            eq = (av.astype("float64").fillna(-0.123456789e300)
                  == bv.astype("float64").fillna(-0.123456789e300))
        else:
            eq = (av.fillna("\x00N") == bv.fillna("\x00N")) if av.dtype == object else (
                av.isna() & bv.isna()) | (av == bv)
        if not eq.all():
            i = int(eq.idxmin())
            return f"VALUE col={c} row={i} spark={av[i]!r} oracle={bv[i]!r}"
    return "OK"


def main(sf_dir: str, out_dir: str) -> int:
    out = Path(out_dir)
    oracles = json.loads((out / "oracle_sql.json").read_text())
    con = duckdb.connect()
    for t in TABLES:
        p = Path(sf_dir) / f"{t}.parquet"
        if p.exists():
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    # version stamp (VERDICT r16 #3): this mirror's verdicts are only
    # comparable to the driver's at matched oracle-stack versions — the
    # r16 e103 mirror-green/driver-red came down to DECIMAL result
    # representation (duckdb .df() -> float64 vs Spark parquet ->
    # object-Decimal), which a raw-value hash sees and this mirror's
    # numeric coercion did not.
    print(f"oracle stack: duckdb {duckdb.__version__}, pandas {pd.__version__}")
    # A raw DECIMAL column in a Spark result is exactly the class that
    # diverges: flag it loudly even when values compare equal here.
    def decimal_cols(df):
        from decimal import Decimal
        return [c for c in df.columns
                if df[c].dtype == object and df[c].map(
                    lambda v: isinstance(v, Decimal)).any()]
    n_ok = n_bad = n_rowsonly = 0
    for qdir in sorted(d for d in out.iterdir() if d.is_dir()):
        name = qdir.name
        marker = qdir / "_FAILED"
        if marker.exists():
            print(f"FAIL {name}: query threw: {marker.read_text().strip()}")
            n_bad += 1
            continue
        try:
            spark_df = pd.read_parquet(qdir)
        except Exception as e:
            print(f"FAIL {name}: cannot read spark output: {e}")
            n_bad += 1
            continue
        if name not in oracles:
            print(f"rows-only {name}: {len(spark_df)} rows")
            n_rowsonly += 1
            continue
        try:
            ora = con.sql(oracles[name]).df()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_bad += 1
            continue
        verdict = compare(canon(spark_df), canon(ora))
        if verdict == "OK":
            dc = decimal_cols(spark_df)
            if dc:
                n_bad += 1
                print(f"FAIL {name}: raw DECIMAL output column(s) {dc} — "
                      "values match here but the driver's raw-value hash "
                      "will mismatch (emit DOUBLE or integer micros instead)")
                continue
            n_ok += 1
            print(f"ok   {name} ({len(spark_df)} rows)")
        else:
            n_bad += 1
            print(f"FAIL {name}: {verdict}")
    missing = [q for q in oracles if not (out / q).is_dir()]
    for q in missing:
        print(f"FAIL {q}: no spark output produced")
    n_bad += len(missing)
    print(f"\n{n_ok} ok, {n_bad} fail, {n_rowsonly} rows-only")
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
