"""The round's STRUCTURALLY-LAST verification gate (VERDICT-r10 item 3).

Two rounds in a row ended with the exit note drifting from the final
tree: r9's README pinned a stale suite count, r10's full sweep ran one
registration early (the KMV twin landed after it, so the note said
196/196 against a 197-query registry). The root cause both times was
sequencing by convention — "remember to re-run after the last commit" —
so this script makes the ordering structural instead:

1. refuses to run on a dirty tree (the sweep must describe a COMMIT);
2. runs the full check_oracle sweep and asserts ok+skip == len(QUERIES)
   — a late registration that outran the sweep can no longer hide,
   because the count comes from the SAME tree the sweep just imported;
3. runs the full pytest lane;
4. prints the exact exit-note block (HEAD sha, counts, durations) to
   paste into README — the note can only ever cite numbers this run
   produced against this sha.

Usage: python tools/exit_verify.py [sf_dir]   (default /root/testdata/sf0.01)
"""

from __future__ import annotations

import os
import re
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

    dirty = subprocess.run(
        ["git", "status", "--porcelain"], cwd=REPO, capture_output=True, text=True
    ).stdout.strip()
    # PROGRESS.jsonl churns by driver writes; anything else means the tree
    # isn't the commit the exit note would describe
    dirty = "\n".join(
        ln for ln in dirty.splitlines() if not ln.endswith("PROGRESS.jsonl")
    )
    if dirty:
        print("REFUSING: working tree dirty — commit first, then verify:\n" + dirty)
        return 2
    head = subprocess.run(
        ["git", "rev-parse", "--short", "HEAD"], cwd=REPO, capture_output=True, text=True
    ).stdout.strip()

    sys.path.insert(0, REPO)
    import __spark_entry__ as entry

    n_registered = len(entry.queries())

    t0 = time.time()
    sweep = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "check_oracle.py"), sf_dir],
        cwd=REPO,
        capture_output=True,
        text=True,
    )
    sweep_s = time.time() - t0
    # Spark's console progress bar emits \r-terminated segments on STDOUT,
    # so an "ok" line can share a physical line with a progress bar and a
    # plain ^-anchored count silently undercounts (this exact artifact hid
    # one green row from ad-hoc greps in r11) — normalize \r to \n first
    sweep_out = sweep.stdout.replace("\r", "\n")
    ok = len(re.findall(r"^ok    ", sweep_out, re.M))
    skip = len(re.findall(r"^skip  ", sweep_out, re.M))
    fails = re.search(r"^(\d+) failures", sweep_out, re.M)
    n_fail = int(fails.group(1)) if fails else -1
    if sweep.returncode != 0 or n_fail != 0 or ok + skip != n_registered:
        print(sweep.stdout[-4000:])
        print(
            f"SWEEP MISMATCH @ {head}: ok={ok} skip={skip} fail={n_fail} "
            f"registered={n_registered}"
        )
        return 1

    t0 = time.time()
    pytest_run = subprocess.run(
        [sys.executable, "-m", "pytest", "tests/", "-x", "-q"],
        cwd=REPO,
        capture_output=True,
        text=True,
    )
    pytest_s = time.time() - t0
    tail = pytest_run.stdout.strip().splitlines()[-1] if pytest_run.stdout else "?"
    if pytest_run.returncode != 0:
        print(pytest_run.stdout[-4000:])
        print(f"PYTEST FAILED @ {head}")
        return 1

    print("exit verification: PASS — paste into README:")
    print(
        f"> Exit verification @ `{head}`: `tools/exit_verify.py {sf_dir}` — "
        f"oracle sweep {ok}/{n_registered} ok"
        + (f" (+{skip} rows-only)" if skip else "")
        + f" in {sweep_s:.0f}s; full pytest lane `{tail}` in {pytest_s:.0f}s."
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
