#!/usr/bin/env python3
"""Per-round BPE above-cap fallback ratchet.

The r11 done-bar for above-cap BPE training is >= 10 merges learned per
counting job on the 60k-type synthetic corpus (speculate-verify batch,
BpeTrainer scaladoc). That bar was a manual BpeFallbackBench run; r13
records it per round beside warm_history so a regression in the
speculate-verify rate is caught automatically at close-out (judge r12
"Next round #7").

Usage:
  sbt -batch "Test/runMain graft.tools.BpeFallbackBench ignored 1000 60000" \
      | tee /tmp/bpe_bench.log
  python3 tools/bpe_history.py record <label> /tmp/bpe_bench.log
  python3 tools/bpe_history.py check

Parses the LAST `BPEFALLBACK ... merges_per_job=<x>` line of the log.
Flags: merges/job < 10 (absolute bar), or a >1.3x drop round-over-round.
Exit 0 on success (flags demand adjudication); 2 on usage errors.
"""
import json
import os
import re
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
HISTORY = os.path.join(HERE, "bpe_history.json")
ABSOLUTE_BAR = 10.0
DROP_RATIO = 1.3


def load_history():
    if not os.path.exists(HISTORY):
        return []
    with open(HISTORY) as f:
        return json.load(f)


def compare(prev, cur):
    flags = 0
    print(f"bpe merges/job: {prev['label']}={prev['merges_per_job']} -> "
          f"{cur['label']}={cur['merges_per_job']}")
    if cur["merges_per_job"] < ABSOLUTE_BAR:
        print(f"WARN merges/job {cur['merges_per_job']} below the r11 bar "
              f"({ABSOLUTE_BAR})")
        flags += 1
    if prev is not cur and cur["merges_per_job"] * DROP_RATIO < prev["merges_per_job"]:
        print(f"WARN merges/job dropped >{DROP_RATIO}x vs {prev['label']}")
        flags += 1
    print(f"FLAGS: {flags}")
    return flags


def main():
    if len(sys.argv) < 2 or sys.argv[1] not in ("record", "check"):
        print(__doc__)
        return
    history = load_history()
    if sys.argv[1] == "record":
        if len(sys.argv) < 4:
            print("usage: bpe_history.py record <label> <bench-log-file>")
            sys.exit(2)
        label, log = sys.argv[2], sys.argv[3]
        if not os.path.exists(log):
            print(f"{log} not found — run BpeFallbackBench first (CLAUDE.md)")
            sys.exit(2)
        hits = re.findall(
            r"BPEFALLBACK\s+(\S+)\s+cap=(\d+)\s+merges=(\d+)\s+counting_jobs=(\d+)\s+"
            r"actions=(\d+)\s+merges_per_job=([\d.]+)", open(log).read())
        if not hits:
            print(f"no BPEFALLBACK line found in {log}")
            sys.exit(2)
        lab, cap, merges, jobs, actions, mpj = hits[-1]
        entry = {"label": label, "corpus": lab, "cap": int(cap),
                 "merges": int(merges), "counting_jobs": int(jobs),
                 "actions": int(actions), "merges_per_job": float(mpj)}
        history = [e for e in history if e["label"] != label] + [entry]
        with open(HISTORY, "w") as f:
            json.dump(history, f, indent=1, sort_keys=True)
        print(f"recorded {label}: merges/job={entry['merges_per_job']} -> {HISTORY}")
    if len(history) >= 2:
        compare(history[-2], history[-1])
    elif len(history) == 1:
        compare(history[-1], history[-1])
    else:
        print("no recorded entries")


if __name__ == "__main__":
    main()
