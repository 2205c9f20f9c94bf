#!/usr/bin/env python3
"""Rounding-tie + oracle-type sweep (dev-only; r17, r18 — the
generalizations of the r16/r17 pack_sequences red rows).

VALUE sweep: a `round(x, N)` DOUBLE output whose true value lands exactly
on (or within a few ULPs of) a .5*10^-N boundary is environment-sensitive:
the engine and the oracle can disagree per their doubles' aggregation
order and rounding, so the gate can pass on one DuckDB build and fail on
another. Integer-ratio outputs are the tie-CAPABLE class (a rational k/d
hits the boundary exactly whenever 2*k*10^N ≡ d (mod 2d));
transcendental-valued outputs (entropies, ln, cosines of float vectors)
can only land within ULPs by fluke. This sweep scans a Verify dump (every
query's parquet output) and flags every DOUBLE within TOL of a rounding
boundary at 4 or 6 decimals. A flagged value means: convert that column
to an exact integer representation (ppm via integer division — the
packers' r17 fix) or widen the rounding.

TYPE sweep (r18 — the pack_sequences class the value sweep CANNOT see):
an oracle output column typed HUGEINT/UHUGEINT/DECIMAL in DuckDB (e.g.
uncast arithmetic over a windowed/aggregated sum: sum(BIGINT) → HUGEINT)
has no Spark-side counterpart, and its hash representation differs per
DuckDB build even when values agree — the r4 pivot bug and the r16/r17
pack_sequences red driver rows. DESCRIBE-s every oracle in
oracle_sql.json against the test tables and flags any output column
whose DuckDB type is outside the Spark-representable set. (The DB-API
`description` types are too coarse for this — DuckDB reports every
numeric as NUMBER there, which is exactly why dev_check passed a query
the driver failed.)

Usage: python3 scripts/tie_sweep.py /tmp/vout [sfdir]
       python3 scripts/tie_sweep.py --selftest
"""
import math
import sys
from pathlib import Path

TOL = 1e-9  # absolute distance from the boundary, in rounded units

# DuckDB types with an exact Spark/parquet counterpart; anything else in
# an oracle's output schema is hash-unstable vs the engine's parquet.
SPARK_OK = {
    "BIGINT", "INTEGER", "SMALLINT", "TINYINT", "DOUBLE", "FLOAT",
    "VARCHAR", "BOOLEAN", "DATE", "TIMESTAMP", "BLOB",
}


def type_ok(t):
    t = t.strip()
    if t.endswith("[]"):  # list types: element must be OK
        return type_ok(t[:-2])
    return t in SPARK_OK


def near_tie(v, dp):
    """True iff v is a genuine off-grid near-tie at dp decimals: within
    TOL of a .5*10^-dp rounding boundary but NOT exactly on the
    (dp+1)-decimal grid. An already-rounded(dp+1) output lands on its
    grid to within a few ULPs of the decimal→double conversion — the
    gate hash proves both engines agreed on it, so it's excluded; a
    true near-tie (off by ~1e-11..1e-8) is NOT on the finer grid and
    flags. (r18 — the r17 exclusion used a 1e-6 window that subsumed
    the tie test entirely, making the sweep vacuous: ADVICE r17.)"""
    if not isinstance(v, float) or math.isnan(v) or math.isinf(v) or v == 0:
        return False
    scaled = abs(v) * 10 ** dp
    frac = scaled - math.floor(scaled)
    if abs(frac - 0.5) >= TOL:
        return False
    finer = abs(v) * 10 ** (dp + 1)
    return abs(finer - round(finer)) > 4 * math.ulp(finer)


def selftest():
    # an exactly-rounded(5dp) double ending in 5 at the 5th decimal:
    # .5 boundary at 4dp, but ON the 5dp grid -> must be excluded
    assert not near_tie(0.12345, 4), "rounded-value exclusion broke"
    assert not near_tie(0.1234565, 6), "rounded-value exclusion broke (6dp)"
    # a genuine off-grid near-tie: within TOL of the boundary (TOL is in
    # SCALED units, so the raw perturbation is TOL/10^dp-sized), yet
    # tens of ULPs off the finer grid -> MUST flag (the r16 red-row
    # class: an aggregation-order-dependent double next to a boundary)
    assert near_tie(0.12345 + 1e-14, 4), "near-tie not flagged"
    assert near_tie(0.1234565 + 5e-16, 6), "6dp near-tie not flagged"
    # far from any boundary -> quiet
    assert not near_tie(0.1234, 4)
    assert not near_tie(math.pi, 4) and not near_tie(math.pi, 6)
    print("selftest OK")


def main():
    if sys.argv[1] == "--selftest":
        selftest()
        return
    import duckdb
    import json

    out_dir = Path(sys.argv[1])
    sf_dir = Path(sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01")
    con = duckdb.connect()
    flagged = []
    n_vals = 0
    for res_dir in sorted(p for p in out_dir.iterdir() if p.is_dir()):
        name = res_dir.name
        try:
            rows = con.execute(
                f"SELECT * FROM read_parquet('{res_dir}/*.parquet')"
            ).fetchall()
            cols = [d[0] for d in con.description]
        except Exception as e:
            print(f"  SKIP {name}: {e}")
            continue
        for r in rows:
            for c, v in zip(cols, r):
                if not isinstance(v, float) or math.isnan(v) or v == 0:
                    continue
                n_vals += 1
                for dp in (4, 6):
                    if near_tie(v, dp):
                        flagged.append((name, c, v, dp))
    if flagged:
        print(f"{len(flagged)} near-tie values over {n_vals} doubles:")
        for name, c, v, dp in flagged:
            print(f"  TIE? {name}.{c} = {v!r} at {dp}dp")
        sys.exit(1)
    print(f"value sweep clean: no near-tie doubles over {n_vals} values "
          f"(tolerance {TOL} at 4dp/6dp)")

    # ---- TYPE sweep over every oracle's DESCRIBE ----
    tables = ("region nation customer supplier part orders lineitem "
              "events documents embeddings").split()
    for t in tables:
        p = sf_dir / f"{t}.parquet"
        if p.exists():
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.loads((out_dir / "oracle_sql.json").read_text())
    type_flags = []
    n_cols = 0
    for name in sorted(oracle):
        try:
            desc = con.execute(f"DESCRIBE ({oracle[name]})").fetchall()
        except Exception as e:
            print(f"  TYPE-SKIP {name}: {e}")
            continue
        for cname, ctype, *_ in desc:
            n_cols += 1
            if not type_ok(ctype):
                type_flags.append((name, cname, ctype))
    if type_flags:
        print(f"{len(type_flags)} non-Spark-representable oracle columns:")
        for name, cname, ctype in type_flags:
            print(f"  TYPE {name}.{cname} :: {ctype} "
                  f"(CAST it — hash-unstable vs the engine's parquet)")
        sys.exit(1)
    print(f"type sweep clean: {n_cols} oracle output columns over "
          f"{len(oracle)} queries, all Spark-representable")


if __name__ == "__main__":
    main()
