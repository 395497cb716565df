"""Differential test: Spark's schema-first CSV/JSON ingestion vs the
DuckDB-oracle cast pattern (VERDICT r8 #8 — the last two surfaces the
verdict named: CSV value typing in `sources/readers.py`, timestamp
parsing on the JSON path).

The hazard class is oracle parity, not a Python transcription this
time: `read_csv` / `read_json` are schema-first (never inferSchema), so
the cell-level question is "given the SAME raw text and the SAME target
type, do Spark's PERMISSIVE parser and the oracle's TRY_CAST produce
the same value?" Today no driver gate ingests CSV/JSON text (fixtures
are parquet; demo1's JSON path is hash-green because its payloads stay
inside the agreeing subset), so nothing is currently wrong — this suite
pins the boundary so a FUTURE gate that feeds text files to both
engines can't silently hash-mismatch on an edge spelling.

Every deviation below was measured live (Spark 4.1 / bundled DuckDB,
session tz UTC) and is asserted EXACTLY: if either engine's parser
moves on upgrade, the test fails and the allow-list must be re-derived
— same protocol as test_avro_partition_inference_differential.py.

Measured deviation themes (direction noted):
- Whitespace: Spark's CSV typer is strict (' 42' -> NULL INT); DuckDB
  trims before casting. Spark is the conservative side.
- Numeric spellings: DuckDB's INTEGER cast accepts '1e3', '4.0',
  '1_000', '0x1A'; Spark rejects all four. Conversely Spark's DOUBLE
  accepts the Java spellings '1.5d' and hex-float '0x1p3' that DuckDB
  rejects — the same Java-literal family the Avro partition-inference
  differential allow-lists (avro_fallback.py `_JAVA_DOUBLE_LITERALS`).
- Case: DuckDB casts lowercase 'nan'/'inf'; Spark only the Java-cased
  'NaN'/'Infinity' forms.
- BOOLEAN: DuckDB accepts '1'/'0'/'t'/'f'; Spark only true/false.
- DATE/TIMESTAMP: DuckDB accepts '2024/01/01' and hour-24 rollover
  ('... 24:00:00'); Spark accepts minute-precision '2024-01-01 00:00'
  which DuckDB rejects.
- JSON: Spark's from_json reads a NUMERIC ts field as epoch seconds
  while the oracle's extract-as-text + TRY_CAST path nulls it; Spark
  nulls type-mismatched n (12.0, "13") where DuckDB's cast coerces;
  Spark salvages a leading object before trailing garbage (PERMISSIVE)
  where DuckDB rejects the whole line; on duplicate keys Spark keeps
  the LAST value, DuckDB's ->> the FIRST.
"""

from __future__ import annotations

import pytest

from tutorial_apache_beam_spark.sources.readers import read_csv, read_json


class Dev:
    """Allow-listed measured deviation: pins BOTH engines' values."""

    def __init__(self, spark_val, duck_val):
        self.spark = spark_val
        self.duck = duck_val


# --------------------------------------------------------------------------
# CSV suite: one single-column file per target type. Each case is
# (raw_text, agreed_value) or (raw_text, Dev(spark_value, duck_value)).
# Values are normalized to str (None for NULL) before comparison.

CSV_CASES = {
    "INT": [
        ("42", "42"),
        (" 42", Dev(None, "42")),        # Spark strict, DuckDB trims
        ("42 ", Dev(None, "42")),
        ("+7", "7"),
        ("007", "7"),
        ("2147483647", "2147483647"),
        ("2147483648", None),             # both overflow -> NULL
        ("-2147483648", "-2147483648"),
        ("1e3", Dev(None, "1000")),       # DuckDB casts via DOUBLE
        ("4.0", Dev(None, "4")),
        ("1_000", Dev(None, "1000")),     # DuckDB digit separators
        ("0x1A", Dev(None, "26")),        # DuckDB hex ints
        ("", None),
        ("null", None),
        ("NULL", None),
    ],
    "BIGINT": [
        ("9223372036854775807", "9223372036854775807"),
        ("9223372036854775808", None),
        ("-9223372036854775808", "-9223372036854775808"),
    ],
    "DOUBLE": [
        ("NaN", "NaN"),
        ("Infinity", "inf"),
        ("-Infinity", "-inf"),
        ("+Infinity", "inf"),
        ("nan", Dev(None, "NaN")),        # DuckDB case-insensitive
        ("inf", Dev(None, "inf")),
        ("1.5d", Dev("1.5", None)),       # Java d-suffix: Spark only
        ("0x1p3", Dev("8.0", None)),      # Java hex float: Spark only
        ("1e309", "inf"),                 # both saturate
        (".5", "0.5"),
        ("5.", "5.0"),
        ("1,5", None),
        ("1e", None),
        ("1E5", "100000.0"),
    ],
    "BOOLEAN": [
        ("true", "True"),
        ("True", "True"),
        ("TRUE", "True"),
        ("false", "False"),
        ("1", Dev(None, "True")),         # DuckDB numeric booleans
        ("0", Dev(None, "False")),
        ("t", Dev(None, "True")),         # DuckDB single letters
        ("f", Dev(None, "False")),
        ("yes", None),
        ("no", None),
    ],
    "DATE": [
        ("2024-01-01", "2024-01-01"),
        ("2024-1-1", "2024-01-01"),       # both pad
        ("2024/01/01", Dev(None, "2024-01-01")),  # DuckDB slashes
        ("01-01-2024", None),
        ("20240101", None),               # both refuse compact (matches
                                          # the retention-gate contract)
        ("2024-01-01T12:00:00", "2024-01-01"),    # both truncate
        ("2024-13-01", None),
        ("2024-02-30", None),
    ],
    "TIMESTAMP": [
        ("2024-01-01 00:00:00", "2024-01-01 00:00:00"),
        ("2024-01-01T00:00:00", "2024-01-01 00:00:00"),
        ("2024-01-01T00:00:00Z", "2024-01-01 00:00:00"),
        ("2024-01-01T00:00:00+05:30", "2023-12-31 18:30:00"),  # tz-shift
        ("2024-01-01 00:00:00.123456", "2024-01-01 00:00:00.123456"),
        # both truncate nanos to micros
        ("2024-01-01 00:00:00.123456789", "2024-01-01 00:00:00.123456"),
        ("2024-01-01", "2024-01-01 00:00:00"),
        ("2024-01-01 24:00:00", Dev(None, "2024-01-02 00:00:00")),
        ("2024-01-01 00:00", Dev("2024-01-01 00:00:00", None)),
        ("1704067200", None),             # bare epoch: neither (CSV path)
    ],
}

DUCK_TYPE = {
    "INT": "INTEGER", "BIGINT": "BIGINT", "DOUBLE": "DOUBLE",
    "BOOLEAN": "BOOLEAN", "DATE": "DATE", "TIMESTAMP": "TIMESTAMP",
}

# --------------------------------------------------------------------------
# JSON suite: from_json with "ts TIMESTAMP, n BIGINT" vs the oracle
# pattern TRY_CAST(j->>'$.f' AS T). Values are (ts, n) pairs.

JSON_CASES = [
    ('{"ts": "2024-01-01 00:00:00", "n": 1}',
     ("2024-01-01 00:00:00", "1")),
    ('{"ts": "2024-01-01T00:00:00", "n": 2}',
     ("2024-01-01 00:00:00", "2")),
    ('{"ts": "2024-01-01T00:00:00Z", "n": 3}',
     ("2024-01-01 00:00:00", "3")),
    ('{"ts": "2024-01-01T00:00:00+05:30", "n": 4}',
     ("2023-12-31 18:30:00", "4")),
    ('{"ts": "2024-01-01T00:00:00.123456", "n": 5}',
     ("2024-01-01 00:00:00.123456", "5")),
    ('{"ts": "2024-01-01T00:00:00.123456789", "n": 6}',
     ("2024-01-01 00:00:00.123456", "6")),
    ('{"ts": "2024-01-01", "n": 7}', ("2024-01-01 00:00:00", "7")),
    # Numeric ts: Spark = epoch seconds; the text-extract oracle nulls.
    ('{"ts": 1704067200, "n": 8}',
     Dev(("2024-01-01 00:00:00", "8"), (None, "8"))),
    ('{"ts": "not a time", "n": 9}', (None, "9")),
    ('{"ts": null, "n": 10}', (None, "10")),
    ('{"n": 11}', (None, "11")),
    ('{"ts": "2024-01-01 00:00:00", "n": 2147483648}',
     ("2024-01-01 00:00:00", "2147483648")),
    # Type-mismatched n: Spark nulls the FIELD; DuckDB's cast coerces.
    ('{"ts": "2024-01-01 00:00:00", "n": 12.0}',
     Dev(("2024-01-01 00:00:00", None), ("2024-01-01 00:00:00", "12"))),
    ('{"ts": "2024-01-01 00:00:00", "n": "13"}',
     Dev(("2024-01-01 00:00:00", None), ("2024-01-01 00:00:00", "13"))),
    # Trailing garbage: Spark PERMISSIVE salvages the leading object.
    ('{"ts": "2024-01-01 00:00:00", "n": 14} trailing',
     Dev(("2024-01-01 00:00:00", "14"), (None, None))),
    # Duplicate key: Spark last-wins, DuckDB ->> first-wins.
    ('{"ts": "2024-01-01 00:00:00", "n": 15, "n": 16}',
     Dev(("2024-01-01 00:00:00", "16"), ("2024-01-01 00:00:00", "15"))),
    ('not json at all', (None, None)),
    ('{"ts": "2024-01-01 00:00:00", "n": true}',
     ("2024-01-01 00:00:00", None)),
    ('{"ts": "2024-01-01 00:00:00", "n": 9223372036854775808}',
     ("2024-01-01 00:00:00", None)),
]


def _norm(v):
    if v is None:
        return None
    if isinstance(v, float) and v != v:
        return "NaN"
    return str(v)


@pytest.mark.parametrize("typ", sorted(CSV_CASES))
def test_csv_value_typing_matches_oracle(spark, duck, tmp_path, typ):
    cases = CSV_CASES[typ]
    path = tmp_path / f"csv_{typ}"
    path.mkdir()
    fn = path / "part.csv"
    with open(fn, "w") as fh:
        fh.write("i,v\n")
        for i, (raw, _) in enumerate(cases):
            fh.write(f'{i},"{raw}"\n')   # quoted so padding survives

    rows = read_csv(spark, str(path), f"i INT, v {typ}").orderBy("i").collect()
    spark_vals = [_norm(r.v) for r in rows]
    duck_vals = [
        _norm(r[0])
        for r in duck.execute(
            f"SELECT TRY_CAST(v AS {DUCK_TYPE[typ]}) FROM read_csv(?, "
            "header=true, all_varchar=true) ORDER BY CAST(i AS INT)",
            [str(fn)],
        ).fetchall()
    ]

    assert len(spark_vals) == len(cases) == len(duck_vals)
    for (raw, exp), sv, dv in zip(cases, spark_vals, duck_vals):
        if isinstance(exp, Dev):
            assert (sv, dv) == (exp.spark, exp.duck), (
                f"{typ} {raw!r}: allow-listed deviation moved — measured "
                f"(spark={sv!r}, duck={dv!r}), pinned (spark={exp.spark!r},"
                f" duck={exp.duck!r}); re-derive the allow-list"
            )
        else:
            assert sv == exp and dv == exp, (
                f"{typ} {raw!r}: engines were measured agreeing on "
                f"{exp!r} but now spark={sv!r} duck={dv!r}"
            )


def test_json_timestamp_and_bigint_matches_oracle(spark, duck, tmp_path):
    path = tmp_path / "json_ts"
    path.mkdir()
    fn = path / "part.jsonl"
    with open(fn, "w") as fh:
        for raw, _ in JSON_CASES:
            fh.write(raw + "\n")

    # Single file; Spark's JSON scan and DuckDB's line read both
    # preserve file order for a one-partition input, re-verified by the
    # unique n values in the agreeing rows.
    rows = read_json(spark, str(path), "ts TIMESTAMP, n BIGINT").collect()
    spark_pairs = [(_norm(r.ts), _norm(r.n)) for r in rows]
    duck_pairs = [
        (_norm(r[0]), _norm(r[1]))
        for r in duck.execute(
            "SELECT TRY_CAST(j->>'$.ts' AS TIMESTAMP) AS ts, "
            "TRY_CAST(j->>'$.n' AS BIGINT) AS n "
            "FROM (SELECT TRY_CAST(line AS JSON) AS j FROM read_csv(?, "
            "header=false, columns={'line':'VARCHAR'}, delim=chr(1), "
            "quote=''))",
            [str(fn)],
        ).fetchall()
    ]

    assert len(spark_pairs) == len(JSON_CASES) == len(duck_pairs)
    for (raw, exp), sp, dp in zip(JSON_CASES, spark_pairs, duck_pairs):
        if isinstance(exp, Dev):
            assert (sp, dp) == (exp.spark, exp.duck), (
                f"JSON {raw!r}: allow-listed deviation moved — measured "
                f"(spark={sp}, duck={dp}), pinned (spark={exp.spark}, "
                f"duck={exp.duck})"
            )
        else:
            assert sp == exp and dp == exp, (
                f"JSON {raw!r}: engines were measured agreeing on {exp} "
                f"but now spark={sp} duck={dp}"
            )


def test_deviation_catalog_is_explicit():
    """The deviation count is pinned — editing a case can't silently
    re-classify a deviation as agreement (or vice versa) without
    updating this census alongside the docstring's themes."""
    csv_devs = [
        (t, raw) for t, cases in CSV_CASES.items()
        for raw, exp in cases if isinstance(exp, Dev)
    ]
    json_devs = [raw for raw, exp in JSON_CASES if isinstance(exp, Dev)]
    assert len(csv_devs) == 17, csv_devs
    assert len(json_devs) == 5, json_devs
