"""Every registered query hash-matches its DuckDB oracle (driver contract).

This is the same check the driver runs at sf0.01 (CORRECTNESS_r{N}.json),
run here at a small SF for fast iteration.
"""

from __future__ import annotations

import pytest

from tests.conftest import SF_DIR, assert_matches_oracle
from tutorial_apache_beam_spark import registry


def _cases():
    q = registry.queries()
    o = registry.oracle_sql()
    return [(name, q[name], o.get(name)) for name in sorted(q)]


@pytest.mark.parametrize("name,fn,oracle", _cases(), ids=[c[0] for c in _cases()])
def test_query_matches_oracle(spark, duck, name, fn, oracle):
    df = fn(spark, SF_DIR)
    if oracle is None:
        # Driver fallback: rows-only check for non-SQL-expressible ops.
        assert df.count() >= 0
        return
    assert_matches_oracle(df, duck, oracle)
