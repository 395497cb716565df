"""Per-analog oracle checks for the TPC-H analog sweep members.

The driver checks the 15 slot-less analog shapes as one tagged-union
gate (`tpch_analog_sweep`); these tests check each member individually
with its FULL output schema (the sweep serializes keys), from the same
oracle table (`TPCH_EXTRA_ORACLES` — single source of truth).
"""

from __future__ import annotations

import pytest

from tests.conftest import SF_DIR, assert_matches_oracle
from tutorial_apache_beam_spark.queries.relational import (
    TPCH_EXTRA_ORACLES,
    TPCH_SWEEP_SPECS,
)


@pytest.mark.parametrize("tag", sorted(TPCH_SWEEP_SPECS))
def test_analog_matches_oracle(spark, duck, tag):
    fn = TPCH_SWEEP_SPECS[tag][0]
    assert_matches_oracle(fn(spark, SF_DIR), duck, TPCH_EXTRA_ORACLES[tag])
