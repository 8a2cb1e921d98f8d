#!/usr/bin/env python3
"""DuckDB side of the differential query fuzzer (graft.FuzzSpec).

Reads a {name: sql} JSON file, executes each statement in DuckDB, and writes
{name: rows | {"error": msg}} JSON, where rows are lists of stringified cells
(None for SQL NULL; repr() for floats so the value round-trips exactly; str()
for everything else). The Scala side canonicalizes both engines' strings the
same way before comparing, so formatting differences (1e+23 vs 1.0E23,
trailing decimal zeros) cannot cause false mismatches.
"""
import json
import sys

import duckdb


def main(qfile, outfile):
    with open(qfile) as f:
        qs = json.load(f)
    con = duckdb.connect()
    out = {}
    for name, sql in qs.items():
        try:
            rows = con.execute(sql).fetchall()
            out[name] = [
                [None if v is None else (repr(v) if isinstance(v, float) else str(v))
                 for v in r]
                for r in rows
            ]
        except Exception as ex:  # surface the failing statement to the test
            out[name] = {"error": f"{type(ex).__name__}: {ex}"}
    with open(outfile, "w") as f:
        json.dump(out, f)


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
