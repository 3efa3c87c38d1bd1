"""Propose the next driver-check window: never-recorded oracle entries.

The external correctness tooling samples a ~50-entry prefix of
``queries()``; each round the prefix should lead with oracle-backed
entries that have never appeared in a recorded ``CORRECTNESS_r*.json``
so the verified union keeps growing. This prints the candidate list
(and how many remain) — paste it into ``__ray_entry__._R4_WINDOW``'s
successor at the start of the next round.

Usage: python scripts/gen_window.py [N]   (default 50)
"""

from __future__ import annotations

import glob
import json
import sys

sys.path.insert(0, ".")

import __ray_entry__ as entry  # noqa: E402


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    checked: set[str] = set()
    for f in sorted(glob.glob("CORRECTNESS_r*.json")):
        checked |= set(json.load(open(f)).keys())
    qs = list(entry.queries())
    oracles = set(entry.oracle_sql())
    never = [k for k in qs if k not in checked and k in oracles]
    print(f"# {len(never)} oracle-backed entries never driver-checked "
          f"(checked union: {len(checked)}); next {n}:")
    for name in never[:n]:
        print(f'    "{name}",')


if __name__ == "__main__":
    main()
