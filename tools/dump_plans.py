"""Dump `.explain("formatted")` for registered BATCH gates to files.

Usage:
    python tools/dump_plans.py <outdir> [query ...]

Writes <outdir>/<query>_<suffix>.txt (suffix from $PLAN_SUFFIX, default
"plan") for each named query — or for every batch-family gate when no
names are given. Streaming/sink gates are skipped when sweeping (their
builders RUN drains; the post-drain plan is a memory-sink scan), but an
explicitly named gate is always dumped, whatever its family — the
explicit caller has decided the post-drain plan is the evidence they
want. Gates whose builders materialize intermediates eagerly (the
near-dup/ANN family) do execute those during the dump — run at a small
SF (default sf0.01) so the dump stays cheap.
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.01")
SUFFIX = os.environ.get("PLAN_SUFFIX", "plan")

# Builders that run streaming drains as a side effect (same set as
# tools/plan_audit.py) — excluded from the no-args sweep only.
SKIP_FAMILIES = {"streaming", "sinks"}


def _family_of(name: str) -> str:
    import tutorial_apache_beam_spark.queries as qpkg

    for mod_name in (
        "demo", "streaming", "relational", "analytic", "scalar",
        "pandas_udfs", "llm", "sinks", "similarity",
    ):
        mod = getattr(qpkg, mod_name, None)
        if mod is not None and hasattr(mod, name):
            return mod_name
    return "other"


def main() -> None:
    outdir = sys.argv[1]
    names = sys.argv[2:]
    os.makedirs(outdir, exist_ok=True)
    from tutorial_apache_beam_spark import get_spark, registry

    spark = get_spark(app_name="dump_plans")
    queries = registry.queries()
    if not names:
        names = [
            n for n in sorted(queries)
            if _family_of(n) not in SKIP_FAMILIES
        ]
    import contextlib
    import io

    for name in names:
        df = queries[name](spark, SF_DIR)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(outdir, f"{name}_{SUFFIX}.txt")
        with open(path, "w") as fh:
            fh.write(buf.getvalue())
        spark.catalog.clearCache()
        for t in spark.catalog.listTables():
            if t.name.startswith("replay_"):
                spark.catalog.dropTempView(t.name)
        print(f"wrote {path}")
    spark.stop()


if __name__ == "__main__":
    main()
