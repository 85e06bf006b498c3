#!/usr/bin/env python3
"""Measured single-node BASELINE for the graft bench (feeds BASELINE.md).

Two reproducible baselines, both runnable in this container:

1. numpy flat KNN — the faiss `IndexFlatL2`-class brute force the
   reference actually executes (faiss_utils.py:19-22 is a flat BLAS
   scan + top-k): float32 gemm distance matrix + argpartition top-k
   over the same embeddings, at the native gallery size and on
   replicated galleries (100k / 1M rows) to pair with
   `tools/ScaleProbe`. This is the reference-equivalent number for
   v1/v2 (the only ops the reference itself can run).

2. DuckDB 1.0 running the EXACT oracle SQL of every gated query
   (`oracle_sql.json` as dumped by `graft.Verify`) over the same
   parquet — a state-of-the-art single-node engine computing
   bit-identical semantics, timed with the same interleaved
   median-of-N methodology as `graft.Bench`. DuckDB uses all cores.

Usage:
  python3 tools/baseline.py <sf_dir> <oracle_sql.json> [rounds]

Prints one JSON object with per-query medians; BASELINE.md records a
committed run next to the matching BENCH numbers.
"""
import json, statistics, sys, time

import duckdb
import numpy as np
import pyarrow.parquet as pq

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
oracle_path = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out/oracle_sql.json"
rounds = int(sys.argv[3]) if len(sys.argv) > 3 else 3

# ---------- 1. numpy flat KNN (reference-equivalent op) ----------

emb = pq.read_table(f"{sf_dir}/embeddings.parquet")
gallery = np.stack(emb.column("embedding").to_numpy(zero_copy_only=False)).astype(np.float32)
vec_ids = emb.column("vec_id").to_numpy()
queries = gallery[vec_ids % 100 == 0]  # same query set as v1/v2
K = 5

def flat_knn_seconds(gal: np.ndarray) -> float:
    """One timed flat L2 top-k pass: |g|^2 - 2 q.g^T (+|q|^2 const per row)."""
    t0 = time.perf_counter()
    g2 = (gal * gal).sum(axis=1)
    d2 = g2[None, :] - 2.0 * (queries @ gal.T)
    idx = np.argpartition(d2, K, axis=1)[:, :K]
    # order the k hits (faiss returns sorted distances)
    row = np.arange(idx.shape[0])[:, None]
    order = np.argsort(d2[row, idx], axis=1)
    _ = idx[row, order]
    return time.perf_counter() - t0

knn = {}
for n in [len(gallery), 100_000, 1_000_000]:
    if n == len(gallery):
        gal, tag = gallery, f"native_{n}"
    else:
        reps = (n + len(gallery) - 1) // len(gallery)
        gal, tag = np.tile(gallery, (reps, 1))[:n], str(n)
    flat_knn_seconds(gal)  # warm (allocator, BLAS threads)
    knn[tag] = round(statistics.median(flat_knn_seconds(gal) for _ in range(rounds)), 4)

# ---------- 2. DuckDB on the exact oracle SQL ----------

con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

oracle = json.load(open(oracle_path))
samples = {name: [] for name in oracle}
SLOW = 60.0  # a query over this in the warm-up pass runs ONE timed
# (warm) round instead of all of them: at a >60s-vs-seconds gap, median
# precision is irrelevant, and the slow class (the oracle's deliberately
# NAIVE quadratic twins of d6/d7) would otherwise dominate wall-clock
# for no information. The recorded value is still a WARM sample — the
# cold round-0 run is dropped for every query.
for rnd in range(rounds + 1):  # first interleaved pass = warm-up, dropped
    for name, sql in sorted(oracle.items()):
        if rnd > 1 and samples[name] and samples[name][0] > SLOW:
            continue
        t0 = time.perf_counter()
        con.execute(sql).fetchall()
        dt = time.perf_counter() - t0
        samples[name].append(dt)
        print(f"[baseline] round {rnd} {name} {dt:.3f}s", file=sys.stderr, flush=True)

dq = {n: round(statistics.median(s[1:]) if len(s) > 1 else s[0], 4)
      for n, s in sorted(samples.items())}
print(json.dumps({
    "sf": sf_dir, "rounds": rounds,
    "numpy_flat_knn_sec": knn,
    "duckdb_queries_sec": dq,
    "duckdb_total_sec": round(sum(dq.values()), 3),
}))
