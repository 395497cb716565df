"""Differential check: partition-value inference vs Spark's OWN reader.

`_infer_partition_value` claims to mirror Spark's PartitioningUtils.
Rather than trusting a transcription of that behavior, this builds real
`day=<raw>` directory trees, reads them with `spark.read.parquet`, and
compares the live (dtype, value) against this reader's inference for
the same raw string — so a Spark version shift or a local regression
both fail loudly. Deviations are ALLOWED only where explicitly listed
(the DecimalType fallbacks this container subset has no partition type
for, and int-vs-long width), mirroring the docstring's claims exactly.
"""

from __future__ import annotations

import os
from datetime import date

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from tutorial_apache_beam_spark.sources.avro_fallback import (
    _infer_partition_value,
)

# raw -> expected deviation class (None = must match Spark exactly)
#   "decimal": Spark infers DecimalType, unsupported in the avro
#              partition subset (ours: string for big ints, double for
#              exponent/trailing-dot forms)
#   "width":   Spark types small integers int (then long); ours types
#              all in-range integers long — same values
CASES = {
    "7": "width",
    "+7": "width",
    "-42": "width",
    "007": "width",
    "20260815": "width",
    "2.5": None,
    ".5": None,
    "+.5": None,
    "1_0": None,
    "nan": None,
    "inf": None,
    "NaN": None,
    "Infinity": None,
    "0x10": None,
    "2024-01-31": None,
    "2026-W33-5": None,
    "2024-13-45": None,
    "1e3": "decimal",
    "1.": "decimal",
    "99999999999999999999": "decimal",
    # ADVICE r8: Java Double.parseDouble spellings beyond Python's —
    # signed specials, [dDfF] type suffixes, hex-significand floats,
    # and its trim of chars <= U+0020 — all must infer DOUBLE like
    # Spark does live; near-miss spellings must stay strings.
    "+NaN": None,
    "-NaN": None,
    "1.5d": None,
    "1.5D": None,
    "2f": None,
    "1e3F": None,
    "0x1p3": None,
    "0x.8p1": None,
    "-0x1p-2": None,
    "0x1p3d": None,
    " 7 ": None,      # parseDouble trims; parseLong does not → DOUBLE
    "7\t": None,
    " 2.5d ": None,
    " 2024-01-31 ": None,  # the date path does NOT trim → string
    "0xp3": None,     # hex float needs >=1 significand digit → string
    "1.5dd": None,    # one type suffix max → string
    "NaNf": None,     # no suffix on special literals → string
    "Infinityd": None,
    ".e3": None,
}


@pytest.mark.parametrize("raw", sorted(CASES))
def test_inference_matches_spark_reader(spark, tmp_path, raw):
    d = tmp_path / "tree"
    sub = d / f"day={raw}"
    os.makedirs(sub)
    pq.write_table(pa.table({"v": [1]}), str(sub / "part-0.parquet"))
    sdf = spark.read.parquet(str(d))
    spark_dtype = dict(sdf.dtypes)["day"]
    spark_val = sdf.collect()[0]["day"]
    mine = _infer_partition_value(raw)
    deviation = CASES[raw]

    if deviation == "decimal":
        assert spark_dtype.startswith("decimal"), (raw, spark_dtype)
        # ours must still be LOSSLESS: either the same numeric value as
        # a double, or the raw string
        assert mine == raw or float(mine) == float(spark_val), (raw, mine)
        return
    if deviation == "width":
        assert spark_dtype in ("int", "bigint"), (raw, spark_dtype)
        assert isinstance(mine, int) and mine == spark_val, (raw, mine)
        return

    # exact parity: same Python-visible value and same type family
    if spark_dtype == "string":
        assert mine == spark_val == raw, (raw, mine, spark_val)
    elif spark_dtype == "double":
        assert isinstance(mine, float), (raw, mine)
        if spark_val != spark_val:  # NaN
            assert mine != mine, (raw, mine)
        else:
            assert mine == spark_val, (raw, mine, spark_val)
    elif spark_dtype == "date":
        assert isinstance(mine, date) and mine == spark_val
    else:
        pytest.fail(f"unexpected spark dtype {spark_dtype!r} for {raw!r}")
