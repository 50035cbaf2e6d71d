"""The primary correctness gate, locally: every registered query vs its
DuckDB oracle at sf0.001 (the driver runs the same comparison at sf0.01)."""

import pytest

from isen_projet_bigdata_a3s6_spark import queries as registry
from isen_projet_bigdata_a3s6_spark.oracle_check import check_query

ALL = sorted(registry.queries())


@pytest.mark.parametrize("name", ALL)
def test_query_matches_oracle(spark, sf_dir, name):
    res = check_query(spark, name, sf_dir)
    assert res.ok, str(res)


def test_every_query_has_unique_name():
    assert len(ALL) == len(set(ALL))


def test_oracle_keys_subset():
    assert set(registry.oracle_sql()) <= set(registry.queries())
