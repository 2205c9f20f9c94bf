#!/usr/bin/env python3
"""Cell-level engine-vs-oracle diff for ONE query (dev-only; r18 —
VERDICT r17 Missing #1). When the driver's gate reports a hash mismatch,
this turns it into the first differing (row, column, value-repr, type):
loads the engine's Verify parquet and runs the oracle SQL in DuckDB,
prints both sides' REAL DuckDB types (DESCRIBE) and Arrow schemas (the
representation a hash actually sees — a HUGEINT fetches as Decimal128
through Arrow even when every value fits int64), then walks the sorted
frames and prints the first cell whose repr differs. "repr" matters:
0.5 and 0.5000000001 print alike at low precision but hash apart.

Usage: python3 scripts/dump_diff.py <sfdir> <vout> <query_name>
"""
import json
import math
import sys
from pathlib import Path

import duckdb

TABLES = ("region nation customer supplier part orders lineitem "
          "events documents embeddings").split()


def norm(v):
    if isinstance(v, float) and math.isnan(v):
        return "NaN"
    return v


def main():
    sf_dir, out_dir, name = Path(sys.argv[1]), Path(sys.argv[2]), sys.argv[3]
    con = duckdb.connect()
    for t in TABLES:
        p = sf_dir / f"{t}.parquet"
        if p.exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    sql = json.loads((out_dir / "oracle_sql.json").read_text())[name]
    eng_q = f"SELECT * FROM read_parquet('{out_dir / name}/*.parquet')"

    def side(q, label):
        types = dict((r[0], r[1]) for r in
                     con.execute(f"DESCRIBE ({q})").fetchall())
        rel = con.execute(q)
        arrow = rel.fetch_arrow_table()
        print(f"{label}:")
        for f in arrow.schema:
            duck = types.get(f.name, "?")
            print(f"  {f.name:24s} duckdb={duck:12s} arrow={f.type}")
        cols = arrow.schema.names
        rows = [tuple(norm(v) for v in r) for r in zip(
            *(arrow.column(c).to_pylist() for c in cols))] if cols else []
        return cols, types, rows

    gcols, gtypes, grows = side(eng_q, "engine (Verify parquet)")
    wcols, wtypes, wrows = side(sql, "oracle (DuckDB)")

    if sorted(gcols) != sorted(wcols):
        print(f"COLUMN DIFF: engine={sorted(gcols)} oracle={sorted(wcols)}")
        sys.exit(1)
    tdiff = [(c, gtypes[c], wtypes[c]) for c in sorted(gcols)
             if gtypes[c] != wtypes[c]]
    for c, g, w in tdiff:
        print(f"TYPE DIFF: {c}: engine={g} oracle={w}  "
              f"<-- hash-unstable even if values agree")
    if len(grows) != len(wrows):
        print(f"ROW COUNT DIFF: engine={len(grows)} oracle={len(wrows)}")
        sys.exit(1)
    # driver convention: columns sorted by name, rows in query order
    gidx = [gcols.index(c) for c in sorted(gcols)]
    widx = [wcols.index(c) for c in sorted(wcols)]
    scols = sorted(gcols)
    n_diff = 0
    for i, (g, w) in enumerate(zip(grows, wrows)):
        for j, (gj, wj) in enumerate(zip(gidx, widx)):
            gv, wv = g[gj], w[wj]
            if gv != wv or repr(gv) != repr(wv):
                n_diff += 1
                if n_diff <= 5:
                    print(f"CELL DIFF row {i} col {scols[j]}: "
                          f"engine={gv!r} ({type(gv).__name__}) "
                          f"oracle={wv!r} ({type(wv).__name__})")
    if n_diff == 0 and not tdiff:
        print(f"IDENTICAL: {len(grows)} rows, {len(gcols)} cols, "
              f"values and reprs equal, types aligned")
    elif n_diff == 0:
        print(f"values/reprs equal over {len(grows)} rows — the type diff "
              f"above is the whole mismatch")
        sys.exit(1)
    else:
        print(f"{n_diff} differing cells total")
        sys.exit(1)


if __name__ == "__main__":
    main()
