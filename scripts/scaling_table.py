#!/usr/bin/env python3
"""Rewrite SCALING.md's generated slope table from two graft.Bench runs.

Usage: scaling_table.py <lower.json> <upper.json> <SCALING.md>

lower.json = bench at sf0.1 with SPARK_GRAFT_SLOPE_DIR=sf0.01 (its "slope"
map is the lower decade, its query times are t(sf0.1));
upper.json = bench at sf1 with SPARK_GRAFT_SLOPE_DIR=sf0.1 (its "slope"
map is the upper decade, its query times are t(sf1)).

Replaces everything between the SLOPE_TABLE_BEGIN/END markers; the rest of
SCALING.md (commentary, findings, decompositions) is hand-written and kept.
Stdlib only — runs wherever the repo checks out.
"""
import json
import sys
import time


def load(path):
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line.startswith("{"):
                continue
            d = json.loads(line)
            if d.get("metric") == "total_headline_sec":
                return d
    raise SystemExit(f"no total_headline_sec line in {path}")


def times(d):
    out = {}
    for k in ("queries", "tier2_queries", "tier2_build_sec"):
        out.update(d.get(k, {}))
    return out


def main(lower_path, upper_path, md_path):
    lo, up = load(lower_path), load(upper_path)
    t01 = times(lo)          # t at sf0.1
    t1 = times(up)           # t at sf1
    slo = lo.get("slope", {})   # sf0.1 / sf0.01
    sup = up.get("slope", {})   # sf1 / sf0.1

    rows = []
    for q in sorted(set(slo) | set(sup)):
        def fmt(x):
            return f"{x:.2f}" if isinstance(x, (int, float)) else "—"
        rows.append("| {} | {} | {} | {} | {} |".format(
            q, fmt(t01.get(q)), fmt(slo.get(q)), fmt(t1.get(q)),
            fmt(sup.get(q))))

    stamp = time.strftime("%Y-%m-%d %H:%M UTC", time.gmtime())
    body = [
        f"_Generated {stamp} by `scripts/bench_scale.sh` — do not edit by",
        "hand; rerun the script to refresh. Slopes are t(10×)/t(1×); 10.0 =",
        "linear in data (embeddings scale ×4/decade, so sim_*/graph_* read",
        "against ×4). Machine-state witnesses: lower run calibration "
        f"{lo.get('calibration_sec')}s"
        f" (interleaved min {lo.get('calibration_interleaved_sec')}s),",
        f"upper run {up.get('calibration_sec')}s (interleaved min"
        f" {up.get('calibration_interleaved_sec')}s); scan sentinels"
        f" {lo.get('calibration2_sec')}s / {up.get('calibration2_sec')}s._",
        "",
        "| query | t(sf0.1) s | slope sf0.01→0.1 | t(sf1) s | slope sf0.1→1 |",
        "|---|---|---|---|---|",
    ] + rows
    begin, end = "<!-- SLOPE_TABLE_BEGIN -->", "<!-- SLOPE_TABLE_END -->"
    with open(md_path) as f:
        md = f.read()
    b, e = md.index(begin), md.index(end)
    md = md[: b + len(begin)] + "\n" + "\n".join(body) + "\n" + md[e:]
    with open(md_path, "w") as f:
        f.write(md)
    print(f"wrote {len(rows)} slope rows to {md_path}")


if __name__ == "__main__":
    main(*sys.argv[1:4])
