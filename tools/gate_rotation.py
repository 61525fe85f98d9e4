"""Regenerate GATE_PRIORITY for the driver's 50-key correctness gate
(the registry.py standing rule, restated per the r8/r9 verdicts):

1. keys never driver-checked lead (new this round);
2. then keys whose implementing MODULE changed since their last green
   driver row (a code change invalidates old evidence);
3. then everything else stalest-evidence-first (latest green
   CORRECTNESS round ascending, then key name for determinism).

r12 amendment (VERDICT r11 what's-wrong #2 / next-round #3): the lead
buckets (1+2) are CAPPED at GATE_LEAD_CAP slots — at ~20 new keys per
round the old unbounded lead meant the 50-slot gate never reached the
r1-r3 tail (53 keys stale for three rounds). Overflow from bucket 2
demotes into the stalest-first ordering (module-level change is a
blunt signal; per-key behavior changes are covered by the builder's
own differential checks, and the stale tail has had NO driver row
since r1-r3).

Prints the python tuple body to paste into registry.py.
Usage: python tools/gate_rotation.py [git-ref-of-last-checked-state]
"""

from __future__ import annotations

import glob
import json
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

GATE_LEAD_CAP = 15  # r12 amendment: max lead slots for new/changed keys


def main() -> None:
    import __spark_entry__ as e

    from quackflight_spark.registry import QUERIES, load_all

    load_all()
    keys = list(e.queries())

    latest_green: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(ROOT, "CORRECTNESS_r*.json"))):
        rnd = int(path.rsplit("_r", 1)[1].split(".")[0])
        data = json.load(open(path))
        for k, row in data.items():
            if row.get("rows_match") and row.get("hash_match") is not False:
                latest_green[k] = max(latest_green.get(k, 0), rnd)

    # module file per key
    key_file: dict[str, str] = {}
    for k in keys:
        fn = QUERIES[k]
        mod = sys.modules.get(fn.__module__)
        key_file[k] = os.path.relpath(mod.__file__, ROOT) if mod else "?"

    # files changed since the ref (default: the commit of the newest
    # CORRECTNESS file — approximated by last round-close commit)
    ref = sys.argv[1] if len(sys.argv) > 1 else "HEAD~1"
    changed = set(
        subprocess.run(
            ["git", "diff", "--name-only", ref, "HEAD"],
            cwd=ROOT, capture_output=True, text=True,
        ).stdout.split()
    )

    def bucket(k: str) -> tuple:
        if k not in latest_green:
            return (0, 0, k)                       # never checked
        if key_file[k] in changed:
            return (1, latest_green[k], k)          # code newer than proof
        return (2, latest_green[k], k)              # stalest first

    ordered = sorted(keys, key=bucket)
    never = [k for k in ordered if bucket(k)[0] == 0]
    chg = [k for k in ordered if bucket(k)[0] == 1]
    # cap the lead: never-checked first, then changed-file
    # stalest-first, truncated at GATE_LEAD_CAP; everything else —
    # including demoted changed-file keys — goes stalest-first
    lead = (never + chg)[:GATE_LEAD_CAP]
    lead_set = set(lead)
    tail = sorted(
        (k for k in keys if k not in lead_set),
        key=lambda k: (latest_green.get(k, 0), k),
    )
    print(
        f"# never-checked: {len(never)}; changed-file: {len(chg)}; "
        f"lead (capped {GATE_LEAD_CAP}): {len(lead)}; "
        f"total: {len(ordered)}",
        file=sys.stderr,
    )
    for k in lead:
        b = bucket(k)
        tag = {0: "new", 1: f"chg r{b[1]}", 2: f"r{b[1]}"}[b[0]]
        print(f'    "{k}",  # {tag}')
    for k in tail:
        b = bucket(k)
        tag = {0: "new", 1: f"chg r{b[1]}", 2: f"r{b[1]}"}[b[0]]
        print(f'    "{k}",  # {tag}')


if __name__ == "__main__":
    main()
