#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run Verify's parquet dumps
against the DuckDB oracle SQL and diff (sorted columns, sorted rows)."""
import glob
import json
import os
import sys

import duckdb
import pandas as pd

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
# Optional: previous round's CORRECTNESS_r{N}.json — the gate refuses a
# shrunken suite (round-8 lesson: 18 queries silently dropped while every
# surviving row was green).
prev_file = sys.argv[3] if len(sys.argv) > 3 else None

con = duckdb.connect()
for t in glob.glob(os.path.join(sf_dir, "*.parquet")):
    name = os.path.basename(t).replace(".parquet", "")
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{t}')")

oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))

# Check set = every query Verify attempted (manifest) ∪ every oracle key ∪
# the previous round's query set. A query that failed in Verify, produced no
# dump, or vanished since last round becomes an explicit FAIL row.
manifest = {"queries": [], "failed": {}}
mpath = os.path.join(out_dir, "manifest.json")
if os.path.exists(mpath):
    manifest = json.load(open(mpath))
prev = set()
if prev_file and os.path.exists(prev_file):
    prev = set(json.load(open(prev_file)))

# Approximate-by-design rows carry no SQL oracle; each is guarded by an
# oracle-gated quality row instead. Record the pairing explicitly so the
# artifact reads "gated_by", not as an unexplained gap.
GATED_BY = {
    "ann_ivf": "ann_ivf_recall",
    "ann_ivfpq": "ann_ivfpq_recall",
    "ann_lsh": "ann_lsh_recall",
    "ann_pq": "ann_pq_recall",
    "dd_semantic": "dd_semantic_recall",
    "fr_agg_groups_approx": "fr_agg_groups_approx_err",
}

results = {}
all_names = sorted(set(oracle) | set(manifest["queries"]) | prev)
for name in all_names:
    path = os.path.join(out_dir, name)
    if name in manifest["failed"]:
        results[name] = f"VERIFY FAILED: {manifest['failed'][name][:200]}"
        continue
    if name not in set(manifest["queries"]) | set(oracle):
        results[name] = "DROPPED: present in previous round, gone from suite"
        continue
    if not os.path.isdir(path):
        if name not in oracle:
            continue  # rows-only query handled by the driver's weaker check
        results[name] = "MISSING: no dump directory"
        continue
    if name not in oracle:
        # Dumped, no oracle: the driver records a rows-only check. Surface
        # the quality row that actually gates it (and fail loudly if a
        # no-oracle row ever appears WITHOUT a registered gate — every
        # approximate operator must name its guard).
        gate = GATED_BY.get(name)
        if gate is None:
            results[name] = "NO ORACLE and no registered gate row"
        elif gate not in oracle:
            results[name] = f"NO ORACLE and gate row {gate} missing from suite"
        else:
            print(f"GATED {name}: rows-only, gated_by {gate}")
        continue
    try:
        got = con.execute(
            f"SELECT * FROM read_parquet('{path}/*.parquet')").df()
        exp = con.execute(oracle[name]).df()
        got = got[sorted(got.columns)]
        exp = exp[sorted(exp.columns)]
        if list(got.columns) != list(exp.columns):
            results[name] = f"SCHEMA mismatch: {list(got.columns)} vs {list(exp.columns)}"
            continue
        got = got.sort_values(by=list(got.columns), ignore_index=True)
        exp = exp.sort_values(by=list(exp.columns), ignore_index=True)
        if len(got) != len(exp):
            results[name] = f"ROWS mismatch: {len(got)} vs {len(exp)}"
            continue
        bad = None
        for c in got.columns:
            a, b = got[c], exp[c]
            # The driver hashes typed values: int64 -8 != float64 -8.0. A
            # DuckDB HUGEINT sum lands as float64 in pandas, so flag any
            # int-vs-float dtype split the way the driver's hash would
            # (the round-3 emb_centroids false-green was exactly this).
            kinds = {a.dtype.kind, b.dtype.kind}
            if kinds == {"i", "f"} or kinds == {"u", "f"}:
                bad = f"TYPE mismatch in {c}: {a.dtype} vs {b.dtype}"
                break
            if a.dtype.kind == "f" or b.dtype.kind == "f":
                import numpy as np
                if not np.allclose(a.astype(float), b.astype(float),
                                   rtol=0, atol=0, equal_nan=True):
                    # exact compare; report max diff
                    d = (a.astype(float) - b.astype(float)).abs().max()
                    bad = f"VALUES mismatch in {c} (max abs diff {d})"
                    break
            else:
                if not a.astype(str).equals(b.astype(str)):
                    i = (a.astype(str) != b.astype(str)).idxmax()
                    bad = f"VALUES mismatch in {c} at row {i}: {a[i]!r} vs {b[i]!r}"
                    break
        results[name] = bad or "OK"
    except Exception as e:
        results[name] = f"ERROR: {e}"

ok = sum(1 for v in results.values() if v == "OK")
for k, v in results.items():
    print(f"{'PASS' if v == 'OK' else 'FAIL'} {k}: {v}")
print(f"\n{ok}/{len(results)} OK")
sys.exit(0 if ok == len(results) else 1)
