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


def test_window_leads_with_round13_rotation():
    """r13 window plan (VERDICT r12 item 1, plus the item-4
    exception): the 3 new-in-r13 queries lead, then
    q_text_quality_calib jumps the staleness queue because its
    semantics changed this round (the known-signal probe slice —
    "multi-bin rows in the next CORRECTNESS window"), then the next
    46 stalest tail rows — the three rows r12's budget displaced
    (q_text_tokenfreq_salted / q_text_quality / q_text_fingerprint)
    first, ending at q_text_heavyhitters.  With this window cumulative
    driver coverage reaches 235/235; the r12 window's remaining rows
    moved to the very end (freshest), and the r14 window resumes at
    q_events_runs."""
    order = list(entrymod.queries())
    first50 = order[:50]
    assert first50[:4] == [
        "q_text_bpe_fertility",
        "q_text_quality_gate",
        "q_dedup_crossmodal_keepset",
        "q_text_quality_calib",
    ]
    # the three rows the r12 46-row budget displaced head the block
    assert first50[4:7] == [
        "q_text_tokenfreq_salted",
        "q_text_quality",
        "q_text_fingerprint",
    ]
    for q in (
        "q_text_tokenfreq",
        "q_dedup_decontam",
        "q_knn_join",
        "q_kmeans_scalable",
        "q_dedup_fuzzy",
        "q_graph_pagerank",
    ):
        assert q in first50, q
    assert first50[49] == "q_text_heavyhitters"
    # the r14 window resumes with the four displaced rows, then the
    # old tail order
    assert order[50:55] == [
        "q_events_runs",
        "q_events_pattern",
        "q_events_bandjoin",
        "q_sink_bucketed",
        "q_text_chunk_udtf",
    ]
    # the freshest rows (r12 window minus the re-graded calib) sit at
    # the very end
    assert order[-49] == "q_text_bpe_encode"
    assert order[-1] == "q_text_clean"
