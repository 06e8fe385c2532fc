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


def test_window_leads_with_round12_rotation():
    """r12 window plan (VERDICT r11 item 1): the 3 new-in-r12 queries
    lead, then the next 47 stalest tail rows — the three r06-green
    rows r11's budget displaced (q_rel_topsupplier / q_rel_profit /
    q_rel_bigorders) first, ending at q_text_clean.  With this window
    cumulative driver coverage stays 232/232 (the ledger closed in
    r10; freshness is the only moving part); the r11 window's rows
    moved to the very end (freshest), and the r13 window resumes at
    q_text_tokenfreq_salted."""
    order = list(entrymod.queries())
    first50 = order[:50]
    assert first50[:3] == [
        "q_text_bpe_encode",
        "q_text_quality_calib",
        "q_dedup_crossmodal_delta",
    ]
    # the three rows the r11 47-row budget displaced head the block
    assert first50[3:6] == [
        "q_rel_topsupplier",
        "q_rel_profit",
        "q_rel_bigorders",
    ]
    for q in (
        "q_rel_mktshare",
        "q_dedup_semantic",
        "q_ann_ivf",
        "q_stream_enrich",
        "q_dedup_minhash_calib",
        "q_sink_roundtrip",
    ):
        assert q in first50, q
    assert first50[49] == "q_text_clean"
    # the r13 window resumes with the three displaced rows, then the
    # r11-note resume row
    assert order[50:54] == [
        "q_text_tokenfreq_salted",
        "q_text_quality",
        "q_text_fingerprint",
        "q_text_tokenfreq",
    ]
    # the freshest rows (r11 window) sit at the very end
    assert order[-50] == "q_text_bpe_train"
    assert order[-1] == "q_rel_forecast"
