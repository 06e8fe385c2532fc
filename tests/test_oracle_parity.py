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


from pyspark.sql import functions as F


def test_gate_catches_int_vs_float_zeros(spark):
    """pd.util.hash_pandas_object hashes int64 0 and float64 0.0 to the
    same bit pattern, so the value-hash ALONE passes an all-zeros column
    whose dtype drifted (the r04 q_profile driver miss).  The gate's
    explicit dtype-kind check must fail it."""
    import pandas as pd

    from tests.oracle_utils import _value_hash, assert_matches_oracle

    ints = pd.DataFrame({"z": pd.array([0, 0, 0], dtype="int64")})
    flts = pd.DataFrame({"z": pd.array([0.0, 0.0, 0.0], dtype="float64")})
    # precondition: this is exactly the collision the kind-check exists for
    assert _value_hash(ints) == _value_hash(flts)

    sdf = spark.createDataFrame([(0,), (0,), (0,)], "z long")
    with pytest.raises(AssertionError, match="dtype-kind mismatch"):
        # DuckDB AVG returns DOUBLE -> float64 zeros vs Spark int64 zeros
        assert_matches_oracle(
            sdf,
            "SELECT CAST(0 AS DOUBLE) AS z FROM range(3)",
            SF_CORRECTNESS,
        )


def test_decimal_round_survives_double_resolution(spark):
    """round(double, 6) breaks past ~4.5e9 (|x|*1e6 > 2^53): engines
    land one ulp apart.  _dsum_r6 rounds in decimal FIRST — this pins
    that contract with a sum big enough to trip the double-domain bug
    (caught live by the sf0.1 cross-check on q_rel_pricing)."""
    import duckdb

    from flink_kmeans_clustering_spark.operators.relational import _dsum_r6

    # 1e6 rows of 4883.1057380862005 -> sum ~4.883e9, sub-resolution tail
    df = spark.range(1_000_000).select(
        (F.lit(4883.1057380862005)).alias("v")
    )
    [got] = df.agg(_dsum_r6("v").alias("s")).collect()
    con = duckdb.connect()
    # CAST(... AS DOUBLE) first: the pipeline casts double COLUMNS, and
    # a bare numeric literal would take DuckDB's exact-decimal path
    [(want,)] = con.sql(
        "SELECT CAST(ROUND(SUM(CAST(CAST(4883.1057380862005 AS DOUBLE)"
        "  AS DECIMAL(25,8))), 6) AS DOUBLE) FROM range(1000000)"
    ).fetchall()
    assert got["s"] == want  # bit-identical, not approx
