#!/usr/bin/env python3
"""Build BASELINE_QUERIES.json: per-query engine-vs-engine wall times.

Joins the Spark side (a BENCH_LOCAL_r{N}.json produced by graft.Bench,
min-of-reps, noop sink) with the DuckDB side (oracle_seconds.json
written by scripts/check.py during an oracle sweep: execute + df
materialization per oracle query) at the same scale factor.

The two measurements are not perfectly symmetric — Spark timing includes
its per-query session overhead and full output materialization through
the noop sink; DuckDB timing includes pandas conversion — but both are
end-to-end per query on the same host and data, which makes the "within
2x of a native single-node engine" bar measurable per query instead of
self-referential.

Usage: python3 scripts/baseline.py <bench.json> <oracle_seconds.json> <out.json>
"""
import json, sys

def main(bench_path, oracle_path, out_path):
    bench = json.load(open(bench_path))
    oracle = json.load(open(oracle_path))
    spark = bench["queries"]
    duck = oracle["oracle_seconds"]
    rows = {}
    for q in sorted(set(spark) & set(duck)):
        s, d = spark[q], duck[q]
        rows[q] = {"spark_s": s, "duckdb_s": d,
                   "ratio_spark_over_duckdb": round(s / d, 2) if d > 0 else None}
    out = {
        "sf": bench.get("sf"),
        "spark_reps": bench.get("reps"),
        "spark_loadavg_before": bench.get("loadavg_before"),
        "note": ("spark_s = min-of-reps wall incl. session overhead + noop-sink "
                 "materialization; duckdb_s = single-run execute + pandas df "
                 "during the oracle sweep (sequential, self-loaded only)"),
        "queries": rows,
    }
    json.dump(out, open(out_path, "w"), indent=1, sort_keys=True)
    n = len(rows)
    worse2x = sorted((q for q, r in rows.items()
                      if r["ratio_spark_over_duckdb"] and r["ratio_spark_over_duckdb"] > 2.0),
                     key=lambda q: -rows[q]["ratio_spark_over_duckdb"])
    print(f"{n} queries compared; {len(worse2x)} with spark > 2x duckdb")
    for q in worse2x[:25]:
        r = rows[q]
        print(f"  {q:24s} spark {r['spark_s']:8.3f}s duckdb {r['duckdb_s']:8.3f}s "
              f"ratio {r['ratio_spark_over_duckdb']}")

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], sys.argv[3])
