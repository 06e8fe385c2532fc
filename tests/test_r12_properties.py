"""Property-based invariants (hypothesis) for the round-12 work —
each checked against an independent model (pure Python or DuckDB), not
hand-picked fixtures."""

from __future__ import annotations

import math

from hypothesis import given, settings
from hypothesis import strategies as st


# ---------------------------------------------------------------------------
# round_half_away vs DuckDB round() — the rounding-tie contract of the
# trained-classifier fixed-point discipline (ADVICE r11: probe values
# adjacent to 12-dp boundaries, where tie direction would show up)
# ---------------------------------------------------------------------------


def _duck_round(con, x: float, digits: int) -> float:
    return con.sql(
        f"SELECT round(CAST({x!r} AS DOUBLE), {digits}) AS r"
    ).fetchone()[0]


@settings(max_examples=200, deadline=None)
@given(
    k=st.integers(min_value=-(10**6), max_value=10**6),
    off=st.sampled_from([-2, -1, 0, 1, 2]),
    sign=st.sampled_from([1.0, -1.0]),
)
def test_round_half_away_matches_duckdb_at_boundaries(k, off, sign):
    """Construct doubles as close as IEEE allows to the 12-dp rounding
    boundary k·1e-12 + 5e-13 (the exact tie), nudge by ``off`` ulps,
    and require round_half_away(x, 12) == DuckDB round(x, 12) on every
    one — both directions of zero."""
    import duckdb

    from flink_kmeans_clustering_spark.operators.textstats import (
        round_half_away,
    )

    con = duckdb.connect()
    x = sign * (k * 1e-12 + 5e-13)
    for _ in range(abs(off)):
        x = math.nextafter(x, math.inf if off > 0 else -math.inf)
    assert round_half_away(x, 12) == _duck_round(con, x, 12), x


@settings(max_examples=200, deadline=None)
@given(
    x=st.floats(
        min_value=-1.0, max_value=1.0, allow_nan=False, allow_infinity=False
    )
)
def test_round_half_away_matches_duckdb_uniform(x):
    """Uniformly random doubles in the weight-state range agree with
    DuckDB at both 12 dp (gradient state) and 6 dp (metrics)."""
    import duckdb

    from flink_kmeans_clustering_spark.operators.textstats import (
        round_half_away,
    )

    con = duckdb.connect()
    for d in (12, 6):
        assert round_half_away(x, d) == _duck_round(con, x, d), (x, d)


def test_round_half_away_negative_tie_direction():
    """The exact representable ties round AWAY from zero — the case
    the previous floor(x·s + 0.5) form got wrong for negatives."""
    from flink_kmeans_clustering_spark.operators.textstats import (
        round_half_away,
    )

    # 0.5 / 10^0: representable exactly — the canonical tie
    assert round_half_away(0.5, 0) == 1.0
    assert round_half_away(-0.5, 0) == -1.0
    assert round_half_away(1.5, 0) == 2.0
    assert round_half_away(-1.5, 0) == -2.0
    # scaled ties that are exactly representable (dyadic fractions)
    assert round_half_away(-0.25, 1) == -0.3
    assert round_half_away(0.25, 1) == 0.3
