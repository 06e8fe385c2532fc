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


def test_window_leads_with_round9_rotation():
    """r09 window plan (VERDICT r08 items 2+5): the never-checked
    late-r08 trio, the 3 new-in-r09 queries, the 20 r04-green
    leftovers, the four rows-only+twin pairs ADJACENT, then the
    r05-green family head."""
    order = list(entrymod.queries())
    first50 = order[:50]
    assert first50[:6] == [
        "q_dedup_bbit",
        "q_sample_neyman",
        "q_kmeans_spherical",
        "q_text_dsir",
        "q_ann_ivfpq",
        "q_sample_coreset",
    ]
    for q in (
        "q_events_first",
        "q_sample_mixture",
        "q_graph_pagerank",
        "q_ann_pq_trained",
        "q_sample_domain_cap",
    ):
        assert q in first50, q
    # rows-only rows sit directly before their full-oracle twins
    for rows_only, twin in (
        ("q_events_approx_quantiles", "q_events_sampled_quantiles"),
        ("q_dedup_gemm", "q_dedup_embedding"),
        ("q_events_approx_users", "q_events_kmv_users"),
        ("q_kmeans_ml", "q_kmeans_nd"),
    ):
        i = order.index(rows_only)
        assert i < 50 and order[i + 1] == twin, (rows_only, twin)
