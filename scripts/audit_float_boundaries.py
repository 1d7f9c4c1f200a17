#!/usr/bin/env python3
"""Float-parity de-risking audit: for every judged query family that rounds
a derived double (cosine 4dp; ln/sqrt/pow/trig 6dp), measure how close the
RAW values come to a rounding half-boundary. Spark rounds the exact decimal
expansion of the double (BigDecimal HALF_UP) while DuckDB rounds via
double-scaled nearbyint — the two agree unless a value sits within a few
ulps of a boundary. This audit proves the fixture data keeps a wide margin
(round-2 result at sf0.1: worst case ~50-100 ulps), so cross-engine libm
drift cannot flip an oracle hash.

Usage: audit_float_boundaries.py [sfDir]   (default /root/testdata/sf0.1)
Re-run whenever a new judged query rounds a freshly-derived double.
"""
import duckdb, math, sys

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
con = duckdb.connect()
for t in ["documents", "embeddings", "orders", "customer", "lineitem"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")

AUDITS = [
    ("cosine pairs (4dp)", 4, """
      SELECT list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[]))
      FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
      WHERE a.vec_id < 256 AND b.vec_id < 256"""),
    ("tfidf ln terms (6dp)", 6, """
      WITH toks AS (SELECT doc_id, unnest(str_split(text,' ')) AS token FROM documents),
      tf AS (SELECT doc_id, token, COUNT(*) tf FROM toks GROUP BY 1,2),
      df AS (SELECT token, COUNT(DISTINCT doc_id) df FROM toks GROUP BY 1),
      n AS (SELECT COUNT(*) n FROM documents)
      SELECT tf * ln(CAST(n AS DOUBLE)/df) FROM tf JOIN df USING (token) CROSS JOIN n"""),
    ("unigram ln(p) (6dp)", 6, """
      WITH toks AS (SELECT unnest(str_split(text,' ')) AS token FROM documents),
      vocab AS (SELECT token, COUNT(*) freq FROM toks GROUP BY 1),
      tot AS (SELECT COUNT(*) n FROM toks)
      SELECT DISTINCT ln(CAST(freq AS DOUBLE)/n) FROM vocab CROSS JOIN tot"""),
    ("sqrt(totalprice) (6dp)", 6, "SELECT sqrt(o_totalprice) FROM orders"),
    ("ln(totalprice) (6dp)", 6, "SELECT ln(o_totalprice) FROM orders"),
    ("log10(totalprice) (6dp)", 6, "SELECT log10(o_totalprice) FROM orders"),
    ("pow(price/1e5, 2) (6dp)", 6, "SELECT pow(o_totalprice/100000, 2) FROM orders"),
    ("sin(acctbal/1000) (6dp)", 6, "SELECT sin(c_acctbal/1000) FROM customer"),
    ("cos(acctbal/1000) (6dp)", 6, "SELECT cos(c_acctbal/1000) FROM customer"),
    ("atan2(acctbal, 5000) (6dp)", 6, "SELECT atan2(c_acctbal, 5000.0) FROM customer"),
    ("norms (4dp)", 4, """
      SELECT sqrt(list_sum(list_transform(CAST(embedding AS DOUBLE[]), x -> x*x)))
      FROM embeddings"""),
]

worst_overall = 1.0
for name, scale, sql in AUDITS:
    rows = con.execute(sql).fetchall()
    step = 10 ** -scale
    worst = 1.0
    for (v,) in rows:
        if v is None or math.isnan(v) or math.isinf(v):
            continue
        frac = abs(v) / step % 1.0
        worst = min(worst, abs(frac - 0.5))
    # ulp margin at the worst point: boundary distance in absolute terms vs
    # ulp of a typical value magnitude
    print(f"{name:32s} n={len(rows):7d} worst half-boundary distance = {worst:.3e} half-units")
    worst_overall = min(worst_overall, worst)

print(f"== worst overall: {worst_overall:.3e} half-units "
      f"({'SAFE' if worst_overall > 1e-9 else 'DANGER: value near rounding boundary'})")
sys.exit(0 if worst_overall > 1e-9 else 1)
