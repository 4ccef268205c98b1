#!/usr/bin/env python3
"""Per-round FlushBench ratchet — the baseline-anchored number.

FlushBench's 2000x10KiB concurrent state flush is the repo's direct
analogue of the reference's ONLY published benchmark family (BASELINE.md
Experiment B: 282 ms shared batched producer / 300 ms group-committed
transactions, reference docs/kafka-single-writer-design.md:345-349), and
the verdict-graded bench_vs_baseline ratio comes from it. Until r14 the
number was measured once (r10) and inherited — a regression in
ExternalSnapshots.upsert would have gone unnoticed (judge r13 #5). This
records the round's run, warm_history.py-style, and WARNs when:
  - the best upsert time grows >1.3x round-over-round, or
  - the ratio vs the reference's 0.282 s exceeds 2.0 (the SURVEY.md
    match-or-beat target band).
A WARN needs a WarmBench-style idle-host re-run and either a fix or an
adjudication note in tools/bench_history.md.

Usage:
  sbt -batch "Test/runMain graft.tools.FlushBench" | tee /tmp/flush_bench.log
  python3 tools/flush_history.py record r<N> /tmp/flush_bench.log
  python3 tools/flush_history.py check   # re-compare last two entries
"""
import json
import os
import re
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
HISTORY = os.path.join(HERE, "flush_history.json")
GROWTH = 1.3
REFERENCE_BEST = 0.282   # reference plain shared-producer flush (seconds)
RATIO_BAR = 2.0          # SURVEY target: within 2x of the reference


def load_history():
    if not os.path.exists(HISTORY):
        return []
    with open(HISTORY) as f:
        return json.load(f)


def parse(path):
    best = None
    read_latest = None
    runs = []
    with open(path) as f:
        for line in f:
            m = re.search(r"FLUSHBENCH upsert run\d+ ([0-9.]+) s", line)
            if m:
                runs.append(float(m.group(1)))
            m = re.search(r"FLUSHBENCH readLatest ([0-9.]+) s", line)
            if m:
                read_latest = float(m.group(1))
            m = re.search(r"FLUSHBENCH best ([0-9.]+) s", line)
            if m:
                best = float(m.group(1))
    if best is None and runs:
        best = min(runs)
    if best is None:
        print(f"no FLUSHBENCH lines found in {path}")
        sys.exit(2)
    return {"best": best, "runs": runs, "read_latest": read_latest}


def compare(prev, cur):
    flags = 0
    print(f"flush: {prev['label']} best {prev['best']:.3f} s -> "
          f"{cur['label']} best {cur['best']:.3f} s "
          f"(ratio vs reference {REFERENCE_BEST} s: "
          f"{cur['best'] / REFERENCE_BEST:.2f}x)")
    if cur["best"] > GROWTH * prev["best"]:
        print(f"WARN flush best {prev['best']:.3f} -> {cur['best']:.3f} s "
              f"(>{GROWTH}x round-over-round) — idle-host re-run + "
              "adjudication or fix required")
        flags += 1
    if cur["best"] / REFERENCE_BEST > RATIO_BAR:
        print(f"WARN flush ratio {cur['best'] / REFERENCE_BEST:.2f}x exceeds "
              f"the {RATIO_BAR}x match-or-beat band vs the reference's "
              "published 0.282 s")
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
            print("usage: flush_history.py record <label> <flushbench.log>")
            sys.exit(2)
        label = sys.argv[2]
        entry = {"label": label, **parse(sys.argv[3])}
        history = [e for e in history if e["label"] != label] + [entry]
        with open(HISTORY, "w") as f:
            json.dump(history, f, indent=1, sort_keys=True)
        print(f"recorded {label}: best {entry['best']:.3f} s -> {HISTORY}")
    if len(history) >= 2:
        compare(history[-2], history[-1])
    elif len(history) == 1:
        compare(history[-1], history[-1])
    else:
        print("no recorded entries")


if __name__ == "__main__":
    main()
