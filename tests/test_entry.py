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


def test_window_leads_with_round11_rotation():
    """r11 window plan (VERDICT r10 item 1): the 3 new-in-r11 queries
    lead, then the next 47 stalest tail rows — the r06 remainder
    (q_stream_attribution .. q_update) first, ending at
    q_rel_forecast.  With this window cumulative driver coverage
    reaches 229/229; the r10 window's rows moved to the very end
    (freshest), and the r12 window resumes at q_rel_topsupplier."""
    order = list(entrymod.queries())
    first50 = order[:50]
    assert first50[:3] == [
        "q_text_bpe_train",
        "q_text_quality_train",
        "q_dedup_crossmodal",
    ]
    # the r06 remainder heads the stale block
    assert first50[3:7] == [
        "q_stream_attribution",
        "q_embed_health",
        "q_dedup_cc",
        "q_update",
    ]
    for q in (
        "q_assign_join",
        "q_dedup_exact",
        "q_rel_shipping",
        "q_window_ranks",
        "q_multimodal_meta",
        "q_events_topk",
    ):
        assert q in first50, q
    assert first50[49] == "q_rel_forecast"
    # the r12 window resumes with the three displaced r06-green rows
    assert order[50:53] == [
        "q_rel_topsupplier",
        "q_rel_profit",
        "q_rel_bigorders",
    ]
    # the freshest rows (r10 window) sit at the very end
    assert order[-50] == "q_dedup_gear"
    assert order[-1] == "q_sample_epochs"
