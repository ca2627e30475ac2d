"""Driver-row freshness report: newest green CORRECTNESS round per query.

The registry's window-rotation policy (registry/__init__.py) needs the
staleness profile every round — which queries have never been
driver-checked, and which have the oldest green rows — to compose the
next 50-name window. This derives it from the CORRECTNESS_r*.json files
instead of ad-hoc scripts.

Usage: python tools/staleness.py [--list N]  (list queries newest-green
at round N; 0 = never driver-checked)
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def newest_green() -> dict[str, int]:
    """query -> newest round with a green driver row (0 = never)."""
    from airdatapipeline_spark import registry

    newest = {q: 0 for q in registry.QUERIES}
    for path in sorted(glob.glob("CORRECTNESS_r*.json")):
        rnd = int(re.search(r"r(\d+)", os.path.basename(path)).group(1))
        rows = json.load(open(path))
        for name, row in rows.items():
            ok = (
                row.get("rows_match")
                and row.get("schema_match")
                and row.get("hash_match") in (True, None)
            )
            if ok and name in newest:
                newest[name] = max(newest[name], rnd)
    return newest


def main() -> None:
    newest = newest_green()
    from collections import Counter

    profile = Counter(newest.values())
    print("staleness profile (round -> count; 0 = never driver-checked):")
    for rnd in sorted(profile):
        print(f"  r{rnd}: {profile[rnd]}")
    if "--list" in sys.argv:
        want = int(sys.argv[sys.argv.index("--list") + 1])
        for q, rnd in sorted(newest.items()):
            if rnd == want:
                print(q)


if __name__ == "__main__":
    main()
