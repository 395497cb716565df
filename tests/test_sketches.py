"""Sketch aggregates: approx_count_distinct error bound vs the exact count.

HLL++ sketch values are engine-specific, so the operator can never be in
the hash-compared registry (SURVEY §9); its contract is the rsd error
bound, asserted here against the exact distinct count computed in the
same query.
"""

from __future__ import annotations

from tests.conftest import SF_DIR
from tutorial_apache_beam_spark.queries.analytic import approx_distinct_users


def test_approx_distinct_within_rsd_bound(spark):
    rows = approx_distinct_users(spark, SF_DIR).collect()
    assert rows, "no event types in fixture"
    for r in rows:
        exact = r["exact_users"]
        approx = r["approx_users"]
        # rsd=0.01 → 1% relative standard deviation; 5 sigma is a
        # deterministic-fixture-safe bound.
        assert abs(approx - exact) <= max(5, 0.05 * exact), (
            r["event_type"],
            exact,
            approx,
        )
