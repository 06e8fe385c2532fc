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


def test_window_leads_with_round14_rotation():
    """r14 window plan (VERDICT r13 item 1, exactly as docs/STATUS.md
    planned): the 3 new-in-r14 queries lead, then the next 47 stalest
    tail rows — the four rows r13's budget displaced (q_events_runs /
    q_events_pattern / q_events_bandjoin / q_sink_bucketed) first,
    then q_text_chunk_udtf, ending at q_stream_cdc.  With this window
    cumulative driver coverage reaches 238/238; the r13 window's 50
    rows moved to the very end (freshest), and the r15 window resumes
    at q_dedup_minhash."""
    order = list(entrymod.queries())
    first50 = order[:50]
    assert first50[:3] == [
        "q_text_bpe_vocab_sweep",
        "q_text_gate_pr_curve",
        "q_dedup_keepset_compaction",
    ]
    # the four rows the r13 46-row budget displaced head the block
    assert first50[3:8] == [
        "q_events_runs",
        "q_events_pattern",
        "q_events_bandjoin",
        "q_sink_bucketed",
        "q_text_chunk_udtf",
    ]
    for q in (
        "q_events_approx_quantiles",
        "q_rel_mincost",
        "q_dedup_gemm",
        "q_kmeans_ml",
        "q_ann_pq_trained",
        "q_text_bpe",
        "q_dedup_soft",
        "q_events_cdc",
    ):
        assert q in first50, q
    assert first50[49] == "q_stream_cdc"
    # the r15 window resumes with the three displaced rows, then the
    # old tail order
    assert order[50:55] == [
        "q_dedup_minhash",
        "q_dedup_simhash",
        "q_rel_pricing",
        "q_dedup_ngram",
        "q_dedup_twostage",
    ]
    # the freshest rows (the r13 window) sit at the very end
    assert order[-50] == "q_text_bpe_fertility"
    assert order[-1] == "q_text_heavyhitters"
