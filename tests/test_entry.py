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

# The intended round-9 driver window: the 5 R9_QUEUE gates (added after
# the r8 pin; judge pre-verified 5/5 EXACT in the r8 adjudication) —
# after which every gate registered at the r8 pin has a driver-hash row
# — then 45 refreshes of the oldest rows (all r4-vintage), beginning the
# recycling phase.  VERDICT r8 "Next round" #1.
INTENDED_R9_WINDOW = [
    "q_quality_classifier", "q_quality_filter", "q_live_quality",
    "q_dup_spans", "q_gopher_rules",
    "q_bgp_join", "q_agg_group", "q_join_bind_concat", "q_optional",
    "q_union", "q_minus", "q_distinct_order_limit", "q_values",
    "q_graph", "q_expr_functions", "q_ext_outlier", "q_ext_rules",
    "q_hist_sliding", "q_hist_sliding_star", "q_comparator_stats",
    "q_token_count", "q_text_quality", "q_lang_id", "q_fingerprint",
    "q_dedup_exact", "q_dedup_minhash", "q_dedup_simhash",
    "q_ann_bruteforce", "q_ann_lsh", "q_ann_ivf",
    "q_embedding_near_dup", "q_multimodal_decode", "q_nquads_roundtrip",
    "q_ask", "q_construct", "q_property_path", "q_path_inverse_alt",
    "q_path_zero_or_one", "q_path_negated_set", "q_subquery",
    "q_agg_full", "q_tpch_pricing", "q_dedup_keeplist", "q_sessionize",
    "q_sample_hash", "q_sample_stratified", "q_sample_quota",
    "q_split_train_eval", "q_repetition", "q_word_freq",
]

# Slots 1-5 are first-timers (no prior driver-hash row); slots 6-50 are
# deliberate refreshes and must each ALREADY have a prior row.
R9_FIRST_TIMERS = set(INTENDED_R9_WINDOW[:5])


def test_priority_window_pinned():
    """PRIORITY_GATES[:50] must equal the round's intended window."""
    assert entry_mod.PRIORITY_GATES[:50] == INTENDED_R9_WINDOW


def test_priority_gates_no_duplicates():
    pg = entry_mod.PRIORITY_GATES
    assert len(pg) == len(set(pg))


def test_priority_gates_all_in_registry():
    from janus_spark.queries import QUERIES

    missing = [g for g in entry_mod.PRIORITY_GATES if g not in QUERIES]
    assert not missing, f"PRIORITY_GATES not in registry: {missing}"


def _driver_checked(last_round: int) -> set[str]:
    """Union of gate names across CORRECTNESS_r01..r0{last_round}.json."""
    checked: set[str] = set()
    for fn in sorted(os.listdir(ROOT)):
        m = re.fullmatch(r"CORRECTNESS_r0([1-9])\.json", fn)
        if m and int(m.group(1)) <= last_round:
            with open(os.path.join(ROOT, fn)) as f:
                checked.update(json.load(f).keys())
    return checked


def test_window_split_matches_driver_history():
    """The 5 first-timers must be absent from all r1-r8 driver records;
    the 45 refresh slots must each already HAVE a record (they exist to
    refresh the oldest hash rows, not to cover gaps)."""
    checked = _driver_checked(8)
    if not checked:  # fresh clone without driver artifacts
        return
    wrong_first = sorted(R9_FIRST_TIMERS & checked)
    assert not wrong_first, f"first-timers already driver-checked: {wrong_first}"
    unrefreshable = [
        g for g in INTENDED_R9_WINDOW
        if g not in R9_FIRST_TIMERS and g not in checked
    ]
    assert not unrefreshable, (
        f"refresh slots with no prior driver record: {unrefreshable}"
    )


def test_registry_coverage_complete_after_r9():
    """After the r9 window runs, every registry gate has a driver-hash
    row: (all r1-r8 records) ∪ (the pinned r9 window) ⊇ the registry,
    except gates added after the r9 pin (tracked by R10_QUEUE)."""
    from janus_spark.queries import QUERIES

    checked = _driver_checked(8) | set(INTENDED_R9_WINDOW)
    if checked == set(INTENDED_R9_WINDOW):  # fresh clone, no artifacts
        return
    uncovered = [
        g for g in QUERIES
        if g not in checked and g not in getattr(entry_mod, "R10_QUEUE", ())
    ]
    assert not uncovered, f"gates with no driver window scheduled: {uncovered}"


def test_r10_queue_gates_in_registry():
    """Every R10_QUEUE entry must exist in the registry once its feature
    lands — a queue naming a gate that was never registered would let
    the coverage test pass vacuously."""
    from janus_spark.queries import QUERIES

    missing = [g for g in entry_mod.R10_QUEUE if g not in QUERIES]
    assert not missing, f"R10_QUEUE gates not in registry: {missing}"


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
