"""Run every __spark_entry__ query against its DuckDB oracle at sf0.01 —
the same comparison the driver's correctness gate performs."""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from tests.conftest import SF_CORRECTNESS
from tests.oracle_utils import assert_matches_oracle


def _query_names():
    return sorted(entrymod.queries().keys())


@pytest.mark.parametrize("name", _query_names())
def test_query_matches_oracle(spark, name):
    q = entrymod.queries()[name]
    oracles = entrymod.oracle_sql()
    if name not in oracles:
        # rows-only contract: just require a non-erroring, stable result
        df = q(spark, SF_CORRECTNESS)
        assert df.count() >= 0
        return
    assert_matches_oracle(q(spark, SF_CORRECTNESS), oracles[name], SF_CORRECTNESS)


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
    assert set(df.columns) >= {"point_id", "cluster"}


def test_no_orphan_oracles():
    # every oracle key must name a registered query (an orphan would
    # silently skip the driver's comparison for a renamed query)
    orphans = set(entrymod.oracle_sql()) - set(entrymod.queries())
    assert not orphans, f"oracles without queries: {sorted(orphans)}"
