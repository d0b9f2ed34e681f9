"""Compute the NEXT round's driver window from the correctness history.

The per-round rotation rule (VERDICT r8 "Next round" #1, applied every
round since): slots 1..len(queue) are the current queue gates (added
after the last pin, never driver-checked), and the remaining slots up
to 50 refresh the gates whose most recent driver-hash row is OLDEST
(max round per gate over every CORRECTNESS_r*.json, ties broken by
registry order).

Usage: python scripts/next_window.py [queue_attr]

``queue_attr`` defaults to the highest-numbered R{N}_QUEUE attribute
found in __spark_entry__.  Prints the window as a ready-to-paste Python
list plus the vintage distribution of the refresh slots — the window
pin in tests/test_entry.py must be updated in the SAME commit.
"""

from __future__ import annotations

import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

WINDOW = 50


def main() -> None:
    import __spark_entry__ as entry

    from janus_spark.queries import QUERIES

    queues = {
        int(m.group(1)): name
        for name in dir(entry)
        if (m := re.fullmatch(r"R(\d+)_QUEUE", name))
    }
    attr = sys.argv[1] if len(sys.argv) > 1 else queues[max(queues)]
    queue = list(getattr(entry, attr))

    last: dict[str, int] = {}
    for fn in sorted(os.listdir(REPO)):
        m = re.fullmatch(r"CORRECTNESS_r(\d+)\.json", fn)
        if not m:
            continue
        with open(os.path.join(REPO, fn)) as f:
            for k in json.load(f):
                last[k] = max(last.get(k, 0), int(m.group(1)))

    order = {g: i for i, g in enumerate(QUERIES)}
    never = [g for g in QUERIES if g not in last and g not in queue]
    if never:
        print(f"WARNING: gates with NO driver row outside {attr}: {never}")
    cands = sorted(
        (g for g in QUERIES if g not in queue),
        key=lambda g: (last.get(g, 0), order[g]),
    )
    refreshes = cands[: WINDOW - len(queue)]
    vintages: dict[int, int] = {}
    for g in refreshes:
        vintages[last.get(g, 0)] = vintages.get(last.get(g, 0), 0) + 1
    print(f"# queue = {attr} ({len(queue)} gates), refresh slots = "
          f"{len(refreshes)}, vintages {vintages}")
    print(f"# window ({WINDOW} gates) — paste into the rotation commit:")
    for g in queue + refreshes:
        print(f'    "{g}",')


if __name__ == "__main__":
    main()
