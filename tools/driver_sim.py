"""Driver-faithful correctness simulation at sf0.01.

Mimics the harness: run each registered query on Spark AND its DuckDB oracle,
canonicalize both results via pandas (sorted columns, sort_values over all
columns, stringified cells), and compare row count + schema-name set + value
hash. Dtype-sensitive: int64 1791 vs float64 1791.0 MISMATCH (like the driver).
"""

from __future__ import annotations

import hashlib
import json
import os
import sys

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tutorial_apache_beam_spark import registry
from tutorial_apache_beam_spark.session import get_spark

SF_DIR = os.environ.get("SIM_SF_DIR", "/root/testdata/sf0.01")
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _canon(df: pd.DataFrame) -> str:
    df = df[sorted(df.columns)]
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort")
    import datetime

    cells = []
    for col in df.columns:
        for v in df[col].tolist():
            if isinstance(v, float):
                cells.append(f"{v:.6g}")
            elif isinstance(v, datetime.date) and not isinstance(v, datetime.datetime):
                # Spark DATE -> datetime.date; DuckDB DATE -> midnight
                # Timestamp. The driver canonicalizes these as equal
                # (r2 evidence: sink_roundtrip_retention hash-matched).
                cells.append(f"{v.isoformat()} 00:00:00")
            else:
                cells.append(str(v))
    return hashlib.md5("\x1f".join(cells).encode()).hexdigest()


def main() -> None:
    only = set(sys.argv[1:])
    spark = get_spark(app_name="driver-sim", master="local[16]", shuffle_partitions=16)
    con = duckdb.connect()
    for t in TABLES:
        path = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")

    qs, oracles = registry.queries(), registry.oracle_sql()
    report = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        entry = {"rows_match": None, "schema_match": None, "hash_match": None, "err": None}
        try:
            sdf = fn(spark, SF_DIR).toPandas()
            sql = oracles.get(name)
            if sql is None:
                entry.update(rows_match=len(sdf) >= 0, note="rows-only")
            else:
                ddf = con.execute(sql).fetchdf()
                entry["rows_match"] = len(sdf) == len(ddf)
                entry["schema_match"] = sorted(sdf.columns) == sorted(ddf.columns)
                entry["hash_match"] = _canon(sdf) == _canon(ddf)
                entry["spark_rows"], entry["oracle_rows"] = len(sdf), len(ddf)
                if not entry["hash_match"] and entry["rows_match"] and entry["schema_match"]:
                    # dump first diff for debugging
                    a = sdf[sorted(sdf.columns)].sort_values(by=sorted(sdf.columns)).reset_index(drop=True)
                    b = ddf[sorted(ddf.columns)].sort_values(by=sorted(ddf.columns)).reset_index(drop=True)
                    diffs = []
                    for col in a.columns:
                        av, bv = a[col].tolist(), b[col].tolist()
                        for i, (x, y) in enumerate(zip(av, bv)):
                            sx = f"{x:.6g}" if isinstance(x, float) else str(x)
                            sy = f"{y:.6g}" if isinstance(y, float) else str(y)
                            if sx != sy:
                                diffs.append(f"{col}[{i}]: spark={sx!r} ({type(x).__name__}) duck={sy!r} ({type(y).__name__})")
                                break
                    entry["first_diffs"] = diffs[:5]
        except Exception as exc:  # noqa: BLE001
            entry["err"] = f"{type(exc).__name__}: {exc}"[:400]
        report[name] = entry
        ok = entry["err"] is None and entry.get("hash_match") in (True, None) and entry["rows_match"]
        print(("PASS " if ok else "FAIL "), name, "" if ok else json.dumps({k: v for k, v in entry.items() if k != "err"}) + (entry["err"] or ""))
        sys.stdout.flush()

    n_ok = sum(
        1 for e in report.values()
        if e["err"] is None and e["rows_match"] and e.get("hash_match") in (True, None)
    )
    print(f"\n{n_ok}/{len(report)} green")
    with open("/tmp/driver_sim.json", "w") as f:
        json.dump(report, f, indent=1, default=str)


if __name__ == "__main__":
    main()
