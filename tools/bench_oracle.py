#!/usr/bin/env python3
"""Time the DuckDB oracle queries (driver-style parquet views) so bench
ratios can be read side by side with BENCH's Spark numbers.

Usage:
  python3 tools/bench_oracle.py <sfDir> <verifyOutDir> [--x10] [names...]

<verifyOutDir> must contain oracle_sql.json (written by graft.Verify).
--x10 materializes the same 10x key-remapped replica graft.Bench uses
(parquet-backed) and times against it.
"""
import sys, os, json, time, tempfile
import duckdb

args = [a for a in sys.argv[1:] if not a.startswith("--")]
x10 = "--x10" in sys.argv
sf_dir, out_dir = args[0], args[1]
names = args[2:] or None

oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
con = duckdb.connect()

tables = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

if x10:
    K = 100000000
    tmp = tempfile.mkdtemp(prefix="graft-oracle-x10-")
    remap = {
        "lineitem": f"* REPLACE (l_orderkey + i*{K} AS l_orderkey)",
        "orders": f"* REPLACE (o_orderkey + i*{K} AS o_orderkey, o_custkey + i*{K} AS o_custkey)",
        "customer": f"* REPLACE (c_custkey + i*{K} AS c_custkey)",
        "events": f"* REPLACE (event_id + i*{K} AS event_id, user_id + i*1000000 AS user_id)",
        "embeddings": f"* REPLACE (CASE WHEN i=0 THEN vec_id ELSE vec_id + i*{K} END AS vec_id)",
        "documents": f"* REPLACE (doc_id + i*{K} AS doc_id, "
                     "concat('c', i, 'x ', replace(text, ' ', concat(' c', i, 'x'))) AS text)",
    }
    for t in tables:
        src = os.path.join(sf_dir, f"{t}.parquet")
        if not os.path.exists(src):
            continue
        dst = os.path.join(tmp, f"{t}.parquet")
        if t in remap:
            con.sql(f"COPY (SELECT {remap[t]} FROM read_parquet('{src}'), range(10) t(i)) TO '{dst}'")
        else:
            con.sql(f"COPY (SELECT * FROM read_parquet('{src}')) TO '{dst}'")
    sf_dir = tmp

con2 = duckdb.connect()
for t in tables:
    p = os.path.join(sf_dir, f"{t}.parquet")
    if os.path.exists(p):
        con2.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

# best-of-2, mirroring graft.Bench's methodology on the Spark side: a
# single pass carries page-cache / first-touch luck, and comparing a
# best-of-2 Spark number against a single-pass oracle number makes the
# cross-system ratio partly a methodology artifact
def time_once(sql):
    t0 = time.time()
    con2.sql(sql).df()
    return round(time.time() - t0, 4)

# Twins whose x10 form is known to exceed the sandbox's memory: the
# ts_rate_extrapolated twin's lattice join fans out ~window/step x per
# sample and was OOM-killed at ~130 GB RSS twice in the r7 judge run.
# The promql_rate_1d twin is the same shape at k = 1440 (a 1m lattice
# day against day windows: ~30M joined rows + min(struct) aggregate) —
# OOM-killed (exit 137) in the r9 builder run; the Spark side runs the
# block prefix/suffix window plan in ~37 s, making this a Spark-only
# row at x10. The extrapolation family's at-scale cross-engine rows
# are promql_increase / promql_ratio, whose day/hour-lattice twins
# join ~1 instant per sample (linear in corpus mass).
# promql_store_rate shares promql_rate_1d's twin SQL verbatim (same
# query through the store layout on the Spark side; the oracle never
# sees the store) — it OOM-killed the r10 judge tool run (exit 137).
# promql_native_rate_1d is the native-histogram k=1440 form of the
# same fan-out (channel explode x day lattice).
# doc_ngram_jaccard's twin is the all-pairs O(n^2) cross join over 50k
# docs at x10 — >14 h in the r8 run and excluded by hand in every
# judge run since (r8–r11 precedent); the Spark side is the inverted
# shingle index at ~4-5 s. Skip it like the OOM twins so a bare
# `--x10` run terminates.
X10_UNSAFE = {"ts_rate_extrapolated", "promql_rate_1d",
              "promql_store_rate", "promql_native_rate_1d",
              "doc_ngram_jaccard"}

out = {}
for name in sorted(names or oracle.keys()):
    if name not in oracle:
        continue
    if x10 and name in X10_UNSAFE:
        out[name] = "skipped: x10 twin exceeds sandbox memory (see comment)"
        print(f"{name:26s} {out[name]}")
        continue
    try:
        out[name] = min(time_once(oracle[name]), time_once(oracle[name]))
    except Exception as e:
        out[name] = f"error: {type(e).__name__}"
    print(f"{name:26s} {out[name]}")
print(json.dumps({"oracle_sec": out, "sf": sf_dir, "x10": x10,
                  "passes": "best-of-2"}))
