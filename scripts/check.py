#!/usr/bin/env python3
"""Dev-side oracle pre-check (mirrors the driver's t2 gate): load each
Verify output parquet, run the corresponding oracle SQL in DuckDB over the
same sf directory, and compare row sets (columns sorted by name, rows
sorted, values hashed). Usage: check.py <sfDir> <verifyOutDir>

Both sides are fetched through pandas (parquet via to_pandas, oracle via
.df()) so NULL-in-numeric (-> NaN) and DATE (-> Timestamp) canonicalize
identically — `check.py --selftest` proves it on a synthetic fixture that
exercises exactly those columns."""
import json, sys, math
import duckdb
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)  # shortest round-trip: full double precision
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, list):
        return "[" + ",".join(canon(x) for x in v) + "]"
    return str(v)

def rowset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted("|".join(canon(r[i]) for i in order) for r in rows)

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        try:
            # read via pandas (NOT to_pylist): the driver compares both sides
            # through pandas, where numeric NULL -> NaN and DATE -> Timestamp;
            # reading the Spark side any other way false-fails oracles that
            # legitimately emit NULL in numeric columns (w3/w8/p10/p22-style)
            sdf = pq.read_table(f"{out_dir}/{name}").to_pandas(date_as_object=False)
            s_cols = list(sdf.columns)
            s_rows = [tuple(r) for r in sdf.itertuples(index=False, name=None)]
        except Exception as e:
            print(f"FAIL {name}: spark output unreadable: {e}")
            n_bad += 1
            continue
        try:
            rel = con.sql(sql)
            # typeof audit: the driver fetches oracle results via pandas,
            # where HUGEINT/DECIMAL degrade to float64 and hash differently
            # from Spark's exact longs. fetchall() (python ints) hid this in
            # round 2 (mm_modality_dispatch) — reject such oracles outright.
            bad_types = [f"{c}:{t}" for c, t in zip(rel.columns, rel.types)
                         if any(k in str(t).upper() for k in ("HUGEINT", "DECIMAL"))]
            if bad_types:
                print(f"FAIL {name}: oracle emits driver-unsafe types {bad_types} "
                      f"(CAST to BIGINT/DOUBLE in the oracle SQL)")
                n_bad += 1
                continue
            # fetch via pandas, exactly like the driver's compare
            ddf = rel.df()
            d_cols = list(ddf.columns)
            d_rows = [tuple(r) for r in ddf.itertuples(index=False, name=None)]
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {str(e)[:200]}")
            n_bad += 1
            continue
        if sorted(s_cols) != sorted(d_cols):
            print(f"FAIL {name}: columns spark={sorted(s_cols)} duck={sorted(d_cols)}")
            n_bad += 1
            continue
        a, b = rowset(s_cols, s_rows), rowset(d_cols, d_rows)
        if a == b:
            print(f"ok   {name} ({len(a)} rows)")
            n_ok += 1
        else:
            n_bad += 1
            print(f"FAIL {name}: rows spark={len(a)} duck={len(b)}")
            sa, sb = set(a), set(b)
            for x in list(sa - sb)[:3]:
                print(f"     spark-only: {x[:160]}")
            for x in list(sb - sa)[:3]:
                print(f"     duck-only:  {x[:160]}")
    print(f"== {n_ok} ok, {n_bad} fail")
    return 1 if n_bad else 0

def selftest():
    """Symmetry proof: a fixture whose columns hit the historically-risky
    canonicalization paths (numeric NULL -> NaN, DATE -> Timestamp, NULL
    DATE, NULL DOUBLE) must compare clean when the parquet side and the
    oracle side hold identical data."""
    import os, tempfile
    out = tempfile.mkdtemp(prefix="check-selftest-")
    sql = """SELECT * FROM (VALUES
      (1::BIGINT, NULL::BIGINT, DATE '2020-01-02', 1.5),
      (2::BIGINT, 7::BIGINT,    DATE '2021-12-31', NULL::DOUBLE),
      (3::BIGINT, NULL::BIGINT, NULL::DATE,        2.25)
    ) v(id, n_nullable, d, x)"""
    con = duckdb.connect()
    os.makedirs(f"{out}/fix_null_date")
    con.execute(f"COPY ({sql}) TO '{out}/fix_null_date/part-0.parquet' (FORMAT PARQUET)")
    json.dump({"fix_null_date": sql}, open(f"{out}/oracle_sql.json", "w"))
    return main(sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.001", out)

if __name__ == "__main__":
    if sys.argv[1] == "--selftest":
        sys.exit(selftest())
    sys.exit(main(sys.argv[1], sys.argv[2]))
