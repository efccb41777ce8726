"""Dump `.explain("formatted")` output for named queries to files.

Usage:
    python tools/dump_plans.py <out_dir> <suffix> <query> [query ...]

Writes <out_dir>/<query>_<suffix>.txt for each query, built against
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1). Each file holds the
FINAL frame's formatted plan plus, when the query builder executes
frames of its own (collect/count/localCheckpoint driver probes — the
pca covariance grid, iterative graph rounds), each build-time executed
plan under a `== Build-time executed plan #N ==` header, mirroring
tests/test_plans.py:plans_of so plan claims about build-time passes are
checkable from the committed files. Run from the repo root whose
graph_db_spark package should be imported (works in a git worktree of
an older commit for "before" captures).
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.getcwd())

from graph_db_spark.plans.queries import QUERIES  # noqa: E402
from graph_db_spark.session import get_spark  # noqa: E402

try:
    from pyspark.sql.classic.dataframe import DataFrame
except ImportError:  # pragma: no cover - pre-4.0 layout
    from pyspark.sql import DataFrame


# Every eager DataFrame action a query builder may run at build time.
# take/head/first route through collect in the classic DataFrame, so this
# list covers them too; tests/test_plans.py asserts its plans_of capture
# list matches this one so the two can never drift apart (ADVICE r13).
BUILDTIME_ACTIONS = ("collect", "count", "localCheckpoint", "toPandas", "isEmpty")


def _explain_str(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode="formatted")
    return buf.getvalue()


@contextlib.contextmanager
def _capture_buildtime(captured: list[str]):
    """Patch the build-time actions so every frame the builder executes
    on its own leaves its formatted plan in `captured` (then delegates
    to the real method — build behavior unchanged)."""

    def wrap(orig):
        def capturing(self, *args, **kwargs):
            captured.append(_explain_str(self))
            return orig(self, *args, **kwargs)

        return capturing

    names = list(BUILDTIME_ACTIONS)
    origs = {m: getattr(DataFrame, m) for m in names}
    for m in names:
        setattr(DataFrame, m, wrap(origs[m]))
    try:
        yield
    finally:
        for m in names:
            setattr(DataFrame, m, origs[m])


def main() -> int:
    if len(sys.argv) < 4:
        print(
            "usage: python tools/dump_plans.py <out_dir> <suffix> <query> [query ...]",
            file=sys.stderr,
        )
        return 2
    out_dir, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("plan-dump")
    rc = 0
    for name in names:
        if name not in QUERIES:
            print(f"SKIP {name}: not in QUERIES", file=sys.stderr)
            rc = 1
            continue
        try:
            buildtime: list[str] = []
            with _capture_buildtime(buildtime):
                df = QUERIES[name](spark, sf_dir)
            parts = [_explain_str(df)]
            for i, p in enumerate(buildtime, 1):
                parts.append(f"\n== Build-time executed plan #{i} ==\n{p}")
            path = os.path.join(out_dir, f"{name}_{suffix}.txt")
            with open(path, "w") as f:
                f.write("".join(parts))
            print(f"wrote {path} (+{len(buildtime)} build-time)")
        except Exception as exc:  # noqa: BLE001 — report and continue
            print(f"FAIL {name}: {exc}", file=sys.stderr)
            rc = 1
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
