"""Guards on the driver contract in ``__spark_entry__.py``.

The driver's correctness check samples the FIRST 50 entries of the
registry returned by ``queries()``.  In round 6 a mid-round gate
insertion silently displaced 13 planned gates past slot 50, so they
missed their driver window (VERDICT r6, "What's wrong" #1).  These
tests pin the window so that can never happen silently again: changing
the head now requires changing this test in the same commit.
"""

from __future__ import annotations

import json
import os
import re
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import __spark_entry__ as entry_mod  # noqa: E402

# The intended round-7 driver window: the 13 gates displaced in r6,
# then the next 37 never-driver-checked gates in registry order.
INTENDED_R7_WINDOW = [
    "q_funnel", "q_pmi", "q_sliding_topk", "q_retention_cohorts",
    "q_ab_test", "q_ohlc_resample", "q_ewma", "q_cusum",
    "q_live_istream", "q_live_dstream", "q_live_session", "q_live_topk",
    "q_live_rollup",
    "q_chunk_documents", "q_pii_scrub", "q_length_hist", "q_asof_join",
    "q_rollup", "q_window_funcs", "q_gapfill", "q_range_join", "q_cube",
    "q_topk_per_group", "q_pivot", "q_latest_event", "q_tpch_revenue",
    "q_skew_join", "q_sample_weighted", "q_doc_logprob",
    "q_time_weighted_avg", "q_sliding_panes", "q_sliding_percentile",
    "q_describe", "q_locf_resample", "q_edit_distance", "q_quality_ntile",
    "q_baseline_last", "q_live_baseline_join", "q_sliding_distinct",
    "q_frame_sample", "q_tpch_local_supplier", "q_tpch_small_quantity",
    "q_live_interval_join", "q_bigram_logprob", "q_interp_resample",
    "q_winsorize", "q_mad_outliers", "q_novelty", "q_embedding_clusters",
    "q_rank_funcs",
]


def test_priority_window_pinned():
    """PRIORITY_GATES[:50] must equal the round's intended window."""
    assert entry_mod.PRIORITY_GATES[:50] == INTENDED_R7_WINDOW


def test_priority_gates_no_duplicates():
    pg = entry_mod.PRIORITY_GATES
    assert len(pg) == len(set(pg))


def test_priority_gates_all_in_registry():
    from janus_spark.queries import QUERIES

    missing = [g for g in entry_mod.PRIORITY_GATES if g not in QUERIES]
    assert not missing, f"PRIORITY_GATES not in registry: {missing}"


def test_window_gates_never_driver_checked():
    """Every gate in the r7 window must be absent from all prior
    CORRECTNESS_r*.json driver records — the whole point of the rotation."""
    checked: set[str] = set()
    for fn in sorted(os.listdir(ROOT)):
        if re.fullmatch(r"CORRECTNESS_r0[1-6]\.json", fn):
            with open(os.path.join(ROOT, fn)) as f:
                checked.update(json.load(f).keys())
    if not checked:  # fresh clone without driver artifacts
        return
    already = [g for g in INTENDED_R7_WINDOW if g in checked]
    assert not already, f"window gates already driver-checked: {already}"


def test_queries_head_order_matches_priority():
    """queries() must yield the priority gates first, in order — the
    driver samples by iteration order."""
    q = entry_mod.queries()
    head = list(q)[: len(entry_mod.PRIORITY_GATES)]
    assert head == entry_mod.PRIORITY_GATES


def test_docs_registry_count_in_sync():
    """README/COVERAGE gate counts must agree with len(QUERIES) —
    VERDICT r6 'Next round' #8 (hand-updated numbers drift)."""
    from janus_spark.queries import QUERIES

    n = len(QUERIES)
    for doc in ("README.md", "COVERAGE.md"):
        text = open(os.path.join(ROOT, doc)).read()
        counts = {int(m) for m in re.findall(r"(\d+)\s+driver-gated", text)}
        assert counts == {n}, (
            f"{doc} says {sorted(counts)} driver-gated queries, "
            f"registry has {n}"
        )
