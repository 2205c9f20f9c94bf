#!/usr/bin/env python3
"""Dev-only harness mimicking the driver's correctness gate (NOT part of the
library; uses driver-side duckdb/pyarrow). Usage:

    python3 scripts/dev_check.py /root/testdata/sf0.01 /tmp/verify_out [name...]

Assumes `sbt "runMain graft.Verify <sfDir> <outDir>"` already produced
<outDir>/<name>/ parquet dirs + oracle_sql.json. Registers each test table as
a DuckDB view named after the table, runs each oracle SQL, and compares
against the Spark parquet result: columns sorted by name, row-by-row exact
value comparison (floats compared exactly — round in the query if this
fails in low decimals).
"""
import json
import math
import sys
from pathlib import Path

import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    return v


def main():
    sf_dir, out_dir = Path(sys.argv[1]), Path(sys.argv[2])
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        p = sf_dir / f"{t}.parquet"
        if p.exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.loads((out_dir / "oracle_sql.json").read_text())
    failures, passed, skipped = [], 0, 0
    for name in sorted(oracle):
        if only and name not in only:
            continue
        res_dir = out_dir / name
        if not res_dir.exists():
            failures.append((name, "spark result missing"))
            continue
        got = con.execute(
            f"SELECT * FROM read_parquet('{res_dir}/*.parquet')").fetchall()
        got_cols = [d[0] for d in con.description]
        # REAL DuckDB types via DESCRIBE, not the DB-API description —
        # that coarsens every numeric to NUMBER, which is exactly how a
        # HUGEINT oracle column (r16/r17 pack_sequences) passed here
        # while failing the driver's width-sensitive hash
        got_types = {r[0]: r[1] for r in con.execute(
            f"DESCRIBE (SELECT * FROM read_parquet('{res_dir}/*.parquet'))"
        ).fetchall()}
        try:
            want = con.execute(oracle[name]).fetchall()
            want_cols = [d[0] for d in con.description]
            want_types = {r[0]: r[1] for r in con.execute(
                f"DESCRIBE ({oracle[name]})").fetchall()}
        except Exception as e:
            failures.append((name, f"oracle SQL failed: {e}"))
            continue
        if sorted(got_cols) != sorted(want_cols):
            failures.append((name, f"columns differ: spark={sorted(got_cols)} oracle={sorted(want_cols)}"))
            continue
        # the driver's hash is type-CLASS-sensitive: int32 vs int64 hash
        # alike (33 driver-green queries emit Spark INTEGER vs oracle
        # BIGINT), but a HUGEINT/DECIMAL oracle column fetches as
        # Decimal128 through Arrow and hashes apart despite equal values
        # (round 1 + the r16/r17 pack_sequences red rows) — compare the
        # CLASS, not the width
        def tclass(t):
            base = t[:-2] if t.endswith("[]") else t
            cls = ("INT" if base in
                   ("TINYINT", "SMALLINT", "INTEGER", "BIGINT") else base)
            return cls + ("[]" if t.endswith("[]") else "")
        tdiff = {c: (got_types[c], want_types[c]) for c in got_cols
                 if tclass(got_types[c]) != tclass(want_types[c])}
        if tdiff:
            failures.append((name, f"column type classes differ (driver hash is class-sensitive): {tdiff}"))
            continue
        gidx = [got_cols.index(c) for c in sorted(got_cols)]
        widx = [want_cols.index(c) for c in sorted(want_cols)]
        if len(got) != len(want):
            failures.append((name, f"row count: spark={len(got)} oracle={len(want)}"))
            continue
        bad = None
        for i, (g, w) in enumerate(zip(got, want)):
            gr = [norm(g[j]) for j in gidx]
            wr = [norm(w[j]) for j in widx]
            if gr != wr:
                bad = (i, gr, wr)
                break
        if bad:
            failures.append((name, f"row {bad[0]}: spark={bad[1]} oracle={bad[2]} cols={sorted(got_cols)}"))
        else:
            passed += 1
            print(f"  PASS {name} ({len(got)} rows)")
    for name, msg in failures:
        print(f"  FAIL {name}: {msg}")
    print(f"{passed} passed, {len(failures)} failed")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
