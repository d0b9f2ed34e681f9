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

# The intended round-8 driver window: the 47 gates with no driver-hash
# row in CORRECTNESS_r01..r07 (the 45-gate never-checked tail + the two
# DSIR gates added mid-r7), then 3 refreshes of r1-vintage core gates —
# VERDICT r7 "Next round" #1.  Completes driver-hash coverage of the
# full 243-gate registry.
INTENDED_R8_WINDOW = [
    "q_optional_filter", "q_not_exists_anti",
    "q_skew_stats", "q_live_percentile", "q_live_ingest_dedup",
    "q_corpus_report", "q_autocorr", "q_bloom_join",
    "q_tpch_returned_items", "q_tpch_large_orders", "q_grouping_sets",
    "q_vocab_coverage", "q_audio_features", "q_asof_forward",
    "q_tpch_promo", "q_cooccurrence", "q_seasonal_outliers",
    "q_corpus_diff", "q_hll_overlap", "q_decompose", "q_cms_join_size",
    "q_zipf_fit", "q_tpch_custdist", "q_tpch_disjunctive",
    "q_tpch_lone_returner", "q_tpch_idle_rich", "q_linreg_trend",
    "q_skyline", "q_cross_corr", "q_incremental_agg", "q_live_linreg",
    "q_attribution", "q_live_attribution", "q_expr_hash",
    "q_scene_changes", "q_live_ohlc", "q_contamination_semantic",
    "q_funnel_time", "q_decayed_topk", "q_keywords",
    "q_period_over_period", "q_benford", "q_tpch_top_supplier",
    "q_tpch_market_share", "q_ltv_cohort",
    "q_dsir_scores", "q_dsir_topk",
    "q_bgp_scan", "q_hist_fixed", "q_baseline_aggregate",
]

# The last three slots are deliberate REFRESHES of r1-vintage gates, not
# first-timers — exempt from the never-checked assertion below.
R8_REFRESHES = {"q_bgp_scan", "q_hist_fixed", "q_baseline_aggregate"}


def test_priority_window_pinned():
    """PRIORITY_GATES[:50] must equal the round's intended window."""
    assert entry_mod.PRIORITY_GATES[:50] == INTENDED_R8_WINDOW


def test_priority_gates_no_duplicates():
    pg = entry_mod.PRIORITY_GATES
    assert len(pg) == len(set(pg))


def test_priority_gates_all_in_registry():
    from janus_spark.queries import QUERIES

    missing = [g for g in entry_mod.PRIORITY_GATES if g not in QUERIES]
    assert not missing, f"PRIORITY_GATES not in registry: {missing}"


def test_window_gates_never_driver_checked():
    """Every non-refresh gate in the r8 window must be absent from all
    prior CORRECTNESS_r*.json driver records — the whole point of the
    rotation (r8 completes full-registry driver-hash coverage)."""
    checked: set[str] = set()
    for fn in sorted(os.listdir(ROOT)):
        if re.fullmatch(r"CORRECTNESS_r0[1-7]\.json", fn):
            with open(os.path.join(ROOT, fn)) as f:
                checked.update(json.load(f).keys())
    if not checked:  # fresh clone without driver artifacts
        return
    already = [
        g for g in INTENDED_R8_WINDOW if g not in R8_REFRESHES and g in checked
    ]
    assert not already, f"window gates already driver-checked: {already}"


def test_registry_coverage_complete_after_r8():
    """After the r8 window runs, every registry gate has a driver-hash
    row: (all r1-r7 records) ∪ (the pinned r8 window) ⊇ the registry."""
    from janus_spark.queries import QUERIES

    checked: set[str] = set(INTENDED_R8_WINDOW)
    for fn in sorted(os.listdir(ROOT)):
        if re.fullmatch(r"CORRECTNESS_r0[1-7]\.json", fn):
            with open(os.path.join(ROOT, fn)) as f:
                checked.update(json.load(f).keys())
    if checked == set(INTENDED_R8_WINDOW):  # fresh clone, no artifacts
        return
    # Gates added AFTER the r8 window was pinned (e.g. the r8
    # quality-classifier family) are exempt — they queue for r9 and are
    # tracked by R9_QUEUE below.
    uncovered = [
        g for g in QUERIES
        if g not in checked and g not in getattr(entry_mod, "R9_QUEUE", ())
    ]
    assert not uncovered, f"gates with no driver window scheduled: {uncovered}"


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
