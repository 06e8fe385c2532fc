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


def test_window_leads_with_round10_rotation():
    """r10 window plan (VERDICT r09 item 2): q_dedup_gear leads (the
    one registry row never driver-checked), then the 3 new-in-r10
    queries, then the next 46 stalest rows — the 26 remaining
    r05-green rows and the first 20 of the r06-green family.  With
    this window cumulative driver coverage reaches 223/223; the r09
    window's rows moved to the very end (freshest)."""
    order = list(entrymod.queries())
    first50 = order[:50]
    assert first50[:4] == [
        "q_dedup_gear",
        "q_sample_doremi",
        "q_multimodal_agreement",
        "q_dedup_delta",
    ]
    # head and tail of the 26 remaining r05-green rows
    assert first50[4] == "q_text_lm_bigram"
    for q in (
        "q_rel_small_qty",
        "q_events_rfm",       # r06 head
        "q_sample_epochs",    # last row of the window
        "q_kmeans",
        "q_assign",
    ):
        assert q in first50, q
    assert first50[49] == "q_sample_epochs"
    # the r06 remainder leads the r11 tail
    assert order[50:54] == [
        "q_stream_attribution",
        "q_embed_health",
        "q_dedup_cc",
        "q_update",
    ]
    # the freshest rows (r09 window) sit at the very end
    assert order[-50] == "q_dedup_bbit"
    assert order[-1] == "q_sample_domain_cap"
