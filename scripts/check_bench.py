"""Bench regression guard (VERDICT r1 item 10): run bench.py and compare
per-query wall times against the previous round's recorded numbers —
exit non-zero if any query regressed more than the allowed ratio at the
same scale factor.

Usage: python scripts/check_bench.py [baseline.json] [max_ratio]

``baseline.json`` defaults to the newest BENCH_r*.json in the repo root;
``max_ratio`` defaults to 1.5.  Storage microbenches on this shared box
are ±40% noisy run-to-run (see bench.py's best-of-3 note), so only
ratios above the threshold on the steady-state query set fail the
check; throughput deltas are printed for the record.
"""

from __future__ import annotations

import glob
import json
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _recover_from_tail(data: dict) -> dict | None:
    """The driver records only the LAST bytes of bench stdout; once the
    JSON line outgrew that window the front is cut and ``parsed`` is
    null (first seen in BENCH_r08).  The timing dicts are flat, so
    recover them (and sf) from the tail text with brace-local regexes."""
    tail = data.get("tail")
    if not isinstance(tail, str):
        return None
    out: dict = {}
    for key in ("queries", "datapipe", "queries_median", "datapipe_median",
                "throughput"):
        m = re.search(r'"%s":\s*(\{[^{}]*\})' % key, tail)
        if m:
            try:
                out[key] = json.loads(m.group(1))
            except json.JSONDecodeError:
                pass
    m = re.search(r'"sf":\s*([0-9.]+)', tail)
    if m:
        out["sf"] = float(m.group(1))
    m = re.search(r'"value":\s*([0-9.]+)', tail)
    if m:
        out["value"] = float(m.group(1))
    return out if out.get("queries") else None


def _parse_baseline_file(path: str) -> dict | None:
    try:
        with open(path) as f:
            data = json.load(f)
    except (OSError, json.JSONDecodeError):
        return None
    return data.get("parsed") or _recover_from_tail(data) or (
        data if data.get("queries") else None
    )


def load_baseline(path: str | None) -> dict:
    """Newest parseable baseline wins.  BENCH_LOCAL_r* (bench.py's own
    full record) is preferred over the driver's BENCH_r* for the same
    round — the driver copy is tail-truncated since r08.  A truncated or
    unparseable newest file falls back to the next-newest instead of
    silently disabling the ratchet (ADVICE r9): exit 0 is reserved for
    'no baseline exists at all'."""
    if path is not None:
        cands = [path]
    else:
        def round_no(p: str) -> int:
            m = re.search(r"_r(\d+)\.json$", p)
            return int(m.group(1)) if m else -1

        cands = sorted(
            glob.glob(os.path.join(REPO, "BENCH_r*.json"))
            + glob.glob(os.path.join(REPO, "BENCH_LOCAL_r*.json")),
            # same round: LOCAL sorts after (preferred) — it is the
            # untruncated record
            key=lambda p: (round_no(p), "LOCAL" in os.path.basename(p)),
            reverse=True,
        )
        if not cands:
            print("no BENCH_r*.json baseline found; nothing to compare")
            sys.exit(0)
    for cand in cands:
        parsed = _parse_baseline_file(cand)
        if parsed is not None:
            if cand != cands[0]:
                print(f"WARNING: newest baseline {cands[0]} unparseable; "
                      f"falling back to {cand}")
            print(f"baseline: {cand} (sf={parsed.get('sf')})")
            return parsed
    print(f"FAIL: no parseable bench baseline among {len(cands)} candidates "
          "(newest: " + cands[0] + ") — ratchet cannot run")
    sys.exit(3)


def run_bench_once() -> dict:
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        capture_output=True,
        text=True,
        timeout=3600,
    )
    if out.returncode != 0:
        print(out.stderr[-3000:])
        sys.exit(2)
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def run_bench(reps: int = 2) -> dict:
    """Per-query best-of-N: this box's ambient load inflates single runs
    by up to ~40%; the minimum is the steady-state signal (same reasoning
    as bench.py's internal best-of-3 for storage)."""
    runs = [run_bench_once() for _ in range(reps)]
    best = dict(runs[0])
    for dct in ("queries", "datapipe", "queries_noop", "datapipe_noop"):
        best[dct] = {
            k: min(r[dct][k] for r in runs if k in r.get(dct, {}))
            for k in runs[0].get(dct, {})
        }
    best["value"] = round(sum(best["queries"].values()), 3)
    return best


# Gates where the count() sink prunes real work from the timed plan
# (computed columns / whole join subtrees — OPTIMIZATION_r10.md item 6),
# so count-to-count ratios can move on plan-pruning accidents rather
# than real cost.  For these the ratchet decision rides the *_noop keys
# when BOTH records carry them (r10 forward); the count keys are still
# printed for the historical record (VERDICT r10 item 7,
# additions-only).
NOOP_RATCHET = {
    "q_clustering_coeff",
    "q_gopher_rules",
    "q_comparator_stats",
    "q_dup_cut",
    "q_line_dedup",
    "q_dsir_scores",
    "q_tpch_pricing",
}


def main() -> None:
    base_path = sys.argv[1] if len(sys.argv) > 1 else None
    max_ratio = float(sys.argv[2]) if len(sys.argv) > 2 else 1.5
    base = load_baseline(base_path)
    cur = run_bench()
    if cur.get("sf") != base.get("sf"):
        print(f"sf mismatch (baseline {base.get('sf')} vs current {cur.get('sf')}); skipping")
        sys.exit(0)

    failures = []
    # Ratchet BOTH timing dicts: in r7 the datapipe shapes were outside
    # the guard and three of them silently printed ~2x box-load-inflated
    # times that a human had to adjudicate (VERDICT r7 "Next round" #2).
    for dct in ("queries", "datapipe"):
        if base.get(dct):
            print(f"[{dct}]")
        for name, was in sorted(base.get(dct, {}).items()):
            now = cur.get(dct, {}).get(name)
            if now is None:
                print(f"  {name:30s} {was:8.3f}s -> MISSING")
                failures.append((name, was, None))
                continue
            was_noop = base.get(f"{dct}_noop", {}).get(name)
            now_noop = cur.get(f"{dct}_noop", {}).get(name)
            if name in NOOP_RATCHET and was_noop and now_noop:
                # decision on the honest full-computation numbers;
                # count keys printed alongside for the record
                ratio = now_noop / was_noop
                flag = "REGRESSED(noop)" if ratio > max_ratio else ""
                print(
                    f"  {name:30s} noop {was_noop:8.3f}s -> {now_noop:8.3f}s"
                    f"  ({ratio:4.2f}x) [count {was:.3f}s -> {now:.3f}s] {flag}"
                )
                if ratio > max_ratio:
                    failures.append((name, was_noop, now_noop))
                continue
            ratio = now / was if was > 0 else 1.0
            flag = "REGRESSED" if ratio > max_ratio else ""
            print(f"  {name:30s} {was:8.3f}s -> {now:8.3f}s  ({ratio:4.2f}x) {flag}")
            if ratio > max_ratio:
                failures.append((name, was, now))
    for k, was in sorted(base.get("throughput", {}).items()):
        now = cur.get("throughput", {}).get(k)
        print(f"  {k:26s} {was:>12} -> {now}")
    print(f"total: {base.get('value')}s -> {cur.get('value')}s")
    if failures:
        print(f"FAIL: {len(failures)} queries regressed >{max_ratio}x: "
              + ", ".join(f[0] for f in failures))
        sys.exit(1)
    print("OK: no query regressed beyond the threshold")


if __name__ == "__main__":
    main()
