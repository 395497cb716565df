"""Generate QUERIES.md — the correctness-gate coverage inventory.

Usage: python -m tutorial_apache_beam_spark.inventory > QUERIES.md
"""

from __future__ import annotations

from tutorial_apache_beam_spark import registry


def main() -> None:
    qs = registry.queries()
    oracles = registry.oracle_sql()
    print("# QUERIES — correctness-gate inventory (generated)")
    print()
    print(
        "One row per `queries()` entry in `__spark_entry__.py`. "
        "`oracle` = hash-compared against DuckDB SQL at sf0.01; "
        "`rows-only` = driver's weaker check (approximate/impl-defined "
        "results), correctness anchored by pytest instead."
    )
    print()
    print("| query | family | check | what it covers |")
    print("|---|---|---|---|")
    for name in sorted(qs):
        fn = qs[name]
        family = fn.__module__.rsplit(".", 1)[-1]
        check = "oracle" if name in oracles else "rows-only"
        doc = (fn.__doc__ or "").strip().splitlines()
        summary = doc[0].rstrip(".") if doc else ""
        print(f"| `{name}` | {family} | {check} | {summary} |")
    n_oracle = len(oracles)
    print()
    print(f"Total: {len(qs)} queries — {n_oracle} oracle-checked, "
          f"{len(qs) - n_oracle} rows-only.")


if __name__ == "__main__":
    main()
