"""Generate PLANS.md — a physical-plan audit of every batch gate.

For each registered batch query (streaming/sink gates drain real queries
when built, so they are audited by their dedicated plan tests instead),
this reads `.explain("formatted")` and counts the node types that decide
100 TB behavior:

- exchanges (shuffles) — the fewer the better, each is a full network pass;
- join strategies — broadcast-hash is the scale-safe default for
  fact⋈dim, sort-merge acceptable for fact⋈fact, nested-loop only ever
  for one-row scalar thresholds, cartesian never;
- Python evaluation nodes — Arrow-vectorized (ArrowEvalPython,
  MapInPandas, FlatMapGroupsInPandas) are the sanctioned escape hatch;
  row-at-a-time BatchEvalPython must NEVER appear;
- scans with pushed filters (predicate reached parquet).

Usage: python tools/plan_audit.py > PLANS.md
"""

from __future__ import annotations

import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.01")

# Gates whose builders run streaming drains (plan text would describe the
# already-materialized result, not the interesting streaming plan).
SKIP_FAMILIES = {"streaming", "sinks"}

NODE_KINDS = [
    ("Exchange", r"\(\d+\) Exchange"),
    ("BroadcastHashJoin", r"\(\d+\) BroadcastHashJoin"),
    ("SortMergeJoin", r"\(\d+\) SortMergeJoin"),
    ("ShuffledHashJoin", r"\(\d+\) ShuffledHashJoin"),
    ("BNLJoin", r"\(\d+\) BroadcastNestedLoopJoin"),
    ("Cartesian", r"\(\d+\) CartesianProduct"),
    ("ArrowPython", r"\(\d+\) (?:ArrowEvalPython|MapInPandas|FlatMapGroupsInPandas|MapGroupsInPandas|BatchEvalPythonUDTF)"),
    ("RowPython", r"\(\d+\) BatchEvalPython\b"),
]


def plan_text(df) -> str:
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def audit(spark) -> list[dict]:
    from bench import _family_of
    from tutorial_apache_beam_spark import registry

    rows = []
    for name, fn in sorted(registry.queries().items()):
        fam = _family_of(name)
        if fam in SKIP_FAMILIES:
            continue
        df = fn(spark, SF_DIR)
        text = plan_text(df)
        row = {"gate": name, "family": fam}
        for label, pat in NODE_KINDS:
            row[label] = len(re.findall(pat, text))
        pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", text)
        row["scans_pushed"] = sum(1 for p in pushed if p.strip())
        row["scans"] = len(re.findall(r"\(\d+\) Scan parquet", text))
        rows.append(row)
    return rows


def main() -> None:
    from tutorial_apache_beam_spark import get_spark

    # AQE OFF for the audit session: gates that materialize internally
    # (persist + count inside the builder) return frames whose explain
    # embeds the ALREADY-EXECUTED adaptive final plan of the cached
    # stages, and AQE's runtime join conversions near a byte threshold
    # are racy under concurrent machine load (observed once: the
    # lexical_neardup_pairs row read 15/22 instead of 16/23 while a full
    # pytest run saturated the box). The header's contract is STATIC
    # strategy counts, so pin the session to the static plan — node
    # KINDS become deterministic run-to-run; production sessions keep
    # AQE on (session.py defaults).
    spark = get_spark(
        app_name="plan_audit",
        extra_conf={"spark.sql.adaptive.enabled": "false"},
    )
    rows = audit(spark)
    cols = [
        "gate", "family", "Exchange", "BroadcastHashJoin", "SortMergeJoin",
        "ShuffledHashJoin", "BNLJoin", "Cartesian", "ArrowPython",
        "RowPython", "scans_pushed", "scans",
    ]
    print("# PLANS — physical-plan audit of the batch gates (generated)")
    print()
    print(
        "Node counts from `.explain(\"formatted\")` at "
        f"`{SF_DIR}` — regenerate with `python tools/plan_audit.py > "
        "PLANS.md`. Streaming/sink gates are excluded (their builders "
        "drain live queries; their plan properties are asserted in "
        "tests/test_plan_quality.py and the streaming tests instead). "
        "Counts are STATIC plans (pre-AQE): SF-linear sides (customer/"
        "supplier/part and join-derived dims) intentionally carry no "
        "broadcast hint — at this fixture SF a few of them therefore "
        "audit as sort-merge, and AQE converts them to broadcast at "
        "runtime when the built side fits; only bounded-cardinality "
        "sides (nation/region/one-row aggregates) are hinted, so the "
        "same plans stay safe at 100-TB SF instead of blowing the "
        "8 GB broadcast limit. The audit session runs with AQE OFF "
        "(r9): gates that materialize internally used to be counted "
        "from the executed adaptive explain, which prints the final "
        "AND initial plans (double-counting those gates' nodes) and "
        "whose runtime join conversions proved racy under concurrent "
        "machine load; totals are therefore lower than the r8 file "
        "for accounting reasons, not because any plan changed."
    )
    print()
    print("| " + " | ".join(cols) + " |")
    print("|" + "---|" * len(cols))
    for r in rows:
        print("| " + " | ".join(str(r[c]) for c in cols) + " |")
    total_row_python = sum(r["RowPython"] for r in rows)
    total_cartesian = sum(r["Cartesian"] for r in rows)
    print()
    print(
        f"Totals: {len(rows)} gates audited, "
        f"{sum(r['Exchange'] for r in rows)} exchanges, "
        f"{sum(r['BroadcastHashJoin'] for r in rows)} broadcast joins, "
        f"{sum(r['SortMergeJoin'] for r in rows)} sort-merge joins, "
        f"{total_cartesian} cartesian products, "
        f"{total_row_python} row-at-a-time Python nodes."
    )
    print()
    print(
        "Invariants the audit enforces: zero `BatchEvalPython` "
        "(row-at-a-time Python) and zero `CartesianProduct` anywhere; "
        "BroadcastNestedLoopJoin only for one-row scalar-threshold "
        "patterns (see tests/test_plan_quality.py, which asserts the "
        "per-gate bounds)."
    )
    if total_row_python or total_cartesian:
        print("\nAUDIT FAILURE: forbidden node present.", file=sys.stderr)
        sys.exit(1)


if __name__ == "__main__":
    main()
