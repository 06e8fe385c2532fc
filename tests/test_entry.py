"""Contract checks on the driver surface (__spark_entry__.py) that need
no Spark session: registry/oracle bookkeeping that used to go stale in
prose (ADVICE r06: the queries() docstring said 174 while the registry
held 193)."""

import re

import __spark_entry__ as entrymod

ROWS_ONLY_BY_DESIGN = {
    "q_kmeans_ml",            # MLlib placement RNG
    "q_events_approx_users",  # HLL++ registers
    "q_events_approx_quantiles",  # GK summaries
    "q_dedup_gemm",           # BLAS-ulp GEMM twin
}


def test_registry_and_oracle_counts_match_docstring():
    qs = entrymod.queries()
    osql = entrymod.oracle_sql()
    doc = entrymod.queries.__doc__
    m = re.search(r"(\d+) queries; (\d+) carry DuckDB oracles, (\d+) are", doc)
    assert m, "docstring must state the counts"
    assert int(m.group(1)) == len(qs)
    assert int(m.group(2)) == len(osql)
    assert int(m.group(3)) == len(qs) - len(set(qs) & set(osql))


def test_every_oracle_key_is_a_registered_query():
    qs = set(entrymod.queries())
    osql = set(entrymod.oracle_sql())
    assert osql <= qs, sorted(osql - qs)


def test_rows_only_set_is_exactly_the_adjudicated_four():
    qs = set(entrymod.queries())
    osql = set(entrymod.oracle_sql())
    assert qs - osql == ROWS_ONLY_BY_DESIGN


def test_window_leads_with_round8_rotation():
    """r08 window plan (VERDICT r07 items 1+2): the 5 new queries, the
    8 never-driver-checked rows, the r03 tail led by q_rel_yoy, and
    the head of the r04-green family."""
    first50 = list(entrymod.queries())[:50]
    for q in (
        "q_multimodal_png",
        "q_embed_matryoshka",
        "q_rel_skewjoin",
        "q_dedup_bloom",
        "q_dedup_crosssource",
        "q_events_hourly",
        "q_stream_funnel",
        "q_embed_isotropy",
        "q_rel_yoy",
        "q_dedup_decontam",
        "q_knn_join",
        "q_rel_groupsets",
    ):
        assert q in first50, q
