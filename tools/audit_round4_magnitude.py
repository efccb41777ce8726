"""Audit oracle emissions for large-magnitude round(,4) floats.

SCALE.md §28 lesson: a round(x, 4) emission of a cross-engine double SUM
is 1-ulp-exposed once |x| is large enough that engine-dependent add order
can move the value across a 5e-5 rounding boundary. This probe runs every
registered oracle in DuckDB at the given sf_dir and reports, per query,
any FLOAT column whose max |value| exceeds the threshold (default 1e8 —
an order of magnitude of headroom under the ~1e9 danger zone at sf0.1).

    python tools/audit_round4_magnitude.py [sf_dir] [threshold]

Output: one line per (query, column) over the threshold, then a summary.
Queries listed here should either emit integer-grid sums (CAST(round(x
* 100) AS BIGINT) cents), share-of-total ratios, or document why the
magnitude is safe (e.g. the value is exact integer arithmetic both
sides). The audit result is recorded in SCALE.md.
"""

from __future__ import annotations

import sys
import time

import duckdb

sys.path.insert(0, ".")

from __spark_entry__ import oracle_sql  # noqa: E402
from graph_db_spark.tables import TABLE_NAMES  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    thresh = float(sys.argv[2]) if len(sys.argv) > 2 else 1e8
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    flagged: list[tuple[str, str, float]] = []
    errs: list[str] = []
    items = sorted(oracle_sql().items())
    for i, (name, sql) in enumerate(items):
        t0 = time.time()
        try:
            rel = con.sql(sql)
            cols = [
                c for c, ty in zip(rel.columns, rel.types)
                if str(ty) in ("DOUBLE", "FLOAT")
            ]
            if not cols:
                print(f"ok   {name}: no float cols [{time.time()-t0:.1f}s]", flush=True)
                continue
            sel = ", ".join(f'max(abs("{c}")) AS "{c}"' for c in cols)
            row = con.sql(f"SELECT {sel} FROM rel").fetchone()
            hits = [
                (c, v) for c, v in zip(cols, row) if v is not None and v >= thresh
            ]
            for c, v in hits:
                flagged.append((name, c, v))
                print(f"MAG  {name}.{c}: max|v| = {v:.6g}", flush=True)
            if not hits:
                print(f"ok   {name}: floats under {thresh:.0e} [{time.time()-t0:.1f}s]", flush=True)
        except Exception as e:  # noqa: BLE001
            errs.append(f"{name}: {e}")
            print(f"ERR  {name}: {e}", flush=True)
    print(f"\n{len(flagged)} flagged cells across "
          f"{len({n for n, _, _ in flagged})} queries; {len(errs)} errors")
    for name, c, v in sorted(flagged, key=lambda x: -x[2]):
        print(f"  {name}.{c}: {v:.6g}")


if __name__ == "__main__":
    main()
