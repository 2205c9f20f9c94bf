#!/usr/bin/env python3
"""Rounding-tie sweep (dev-only; r17 — the generalization of the r16
pack_sequences red row). A `round(x, N)` DOUBLE output whose true value
lands exactly on (or within a few ULPs of) a .5*10^-N boundary is
environment-sensitive: the engine and the oracle can disagree per their
doubles' aggregation order and rounding, so the gate can pass on one
DuckDB build and fail on another. Integer-ratio outputs are the
tie-CAPABLE class (a rational k/d hits the boundary exactly whenever
2*k*10^N ≡ d (mod 2d)); transcendental-valued outputs (entropies, ln,
cosines of float vectors) can only land within ULPs by fluke.

This script scans a Verify dump (every query's parquet output) and flags
every DOUBLE value within TOL of a half-ulp-of-rounding boundary at 4 or
6 decimals — the two rounding resolutions the registry uses. A flagged
value means: convert that column to an exact integer representation
(ppm via integer division — the packers' r17 fix) or widen the rounding.

Usage: python3 scripts/tie_sweep.py /tmp/vout
"""
import math
import sys
from pathlib import Path

import duckdb

TOL = 1e-9  # absolute distance from the boundary, in rounded units


def main():
    out_dir = Path(sys.argv[1])
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
                    scaled = abs(v) * 10 ** dp
                    # skip values living exactly on a FINER rounding
                    # grid (e.g. a round(x, 6) output ending in ...5 at
                    # the 5th decimal trips the 4dp test vacuously —
                    # its rounding already happened one digit deeper
                    # and the gate hash proves both engines agree)
                    finer = abs(v) * 10 ** (dp + 1)
                    if abs(finer - round(finer)) < 1e-6:
                        continue
                    frac = scaled - math.floor(scaled)
                    if abs(frac - 0.5) < TOL:
                        flagged.append((name, c, v, dp))
    if flagged:
        print(f"{len(flagged)} near-tie values over {n_vals} doubles:")
        for name, c, v, dp in flagged:
            print(f"  TIE? {name}.{c} = {v!r} at {dp}dp")
        sys.exit(1)
    print(f"clean: no near-tie doubles over {n_vals} values "
          f"(tolerance {TOL} at 4dp/6dp)")


if __name__ == "__main__":
    main()
