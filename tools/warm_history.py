#!/usr/bin/env python3
"""Per-round WARM-basis bench series with automatic regression flags.

Round 8 proved single-shot cold timings move up to 4.3x on identical
binaries; the warm column is the comparable one. This tool maintains
tools/warm_history.json — one entry per recorded run with the warm total
and every per-query warm second — and flags >1.3x warm deltas against the
previous entry automatically, so regressions stop depending on judge-side
diffing.

Usage:
  python3 tools/warm_history.py record <label>   # append BENCH_FULL.json as <label>, then compare
  python3 tools/warm_history.py check            # compare last two entries only

Exit code: 0 on any successful run, flags included (a regression needs a
WarmBench A/B on an idle host before it is believed, see CLAUDE.md);
2 on usage errors (missing label, BENCH_FULL.json absent) with a clear
message instead of a traceback.
"""
import json
import os
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
HISTORY = os.path.join(HERE, "warm_history.json")
BENCH_FULL = os.path.join(os.path.dirname(HERE), "BENCH_FULL.json")
FLAG_RATIO = 1.3
MIN_SECONDS = 0.3  # ignore ratio noise on sub-300ms queries


def load_history():
    if not os.path.exists(HISTORY):
        return []
    with open(HISTORY) as f:
        return json.load(f)


def compare(prev, cur):
    """Print WARN per >1.3x warm delta (both directions); return flag count."""
    flags = 0
    pq, cq = prev["queries"], cur["queries"]
    print(f"warm totals: {prev['label']}={prev['warm_total']:.1f}s -> "
          f"{cur['label']}={cur['warm_total']:.1f}s "
          f"({cur['warm_total'] / max(prev['warm_total'], 1e-9):.2f}x, "
          f"{len(cq)} vs {len(pq)} queries)")
    for name in sorted(set(pq) & set(cq)):
        p, c = pq[name], cq[name]
        if p <= 0 or c <= 0:
            print(f"WARN {name}: failed pass present (prev={p}, cur={c})")
            flags += 1
            continue
        if max(p, c) < MIN_SECONDS:
            continue
        ratio = c / p
        if ratio > FLAG_RATIO:
            print(f"WARN {name}: warm {p:.2f}s -> {c:.2f}s ({ratio:.2f}x SLOWER)")
            flags += 1
        elif ratio < 1 / FLAG_RATIO:
            print(f"note {name}: warm {p:.2f}s -> {c:.2f}s ({ratio:.2f}x faster)")
    gone = sorted(set(pq) - set(cq))
    new = sorted(set(cq) - set(pq))
    if gone:
        print(f"WARN queries removed since {prev['label']}: {', '.join(gone)}")
        flags += 1
    if new:
        print(f"new queries: {', '.join(new)}")
    print(f"FLAGS: {flags}")
    return flags


def main():
    if len(sys.argv) < 2 or sys.argv[1] not in ("record", "check"):
        print(__doc__)
        return
    history = load_history()
    if sys.argv[1] == "record":
        if len(sys.argv) < 3 or not sys.argv[2].strip():
            print("usage: warm_history.py record <label>   (e.g. record r10)")
            sys.exit(2)
        label = sys.argv[2]
        if not os.path.exists(BENCH_FULL):
            print(f"BENCH_FULL.json not found at {BENCH_FULL} — run the "
                  "sf0.1 Bench step first (see CLAUDE.md close-out order)")
            sys.exit(2)
        with open(BENCH_FULL) as f:
            full = json.load(f)
        # r11+ BENCH_FULL carries {cold, warm_best, warm_spread} per query
        # ("basis":"warm_best_of_2", value = warm total); pre-r11 files had
        # {cold, warm} with value = cold total. Read both so old rounds stay
        # comparable — the per-query warm column is best-of-2 from r11 on.
        new_basis = full.get("basis") == "warm_best_of_2"
        entry = {
            "label": label,
            "sf": full.get("sf"),
            "basis": full.get("basis", "warm_single"),
            "cold_total": round(full["cold_total"] if new_basis else full["value"], 3),
            "warm_total": round(full["warm_total"], 3),
            "errors": full.get("errors", 0),
            "failed": full.get("failed", []),
            "queries": {k: round(v.get("warm_best", v.get("warm")), 3)
                        for k, v in full["queries"].items()},
        }
        history = [e for e in history if e["label"] != label] + [entry]
        with open(HISTORY, "w") as f:
            json.dump(history, f, indent=1, sort_keys=True)
        print(f"recorded {label}: warm_total={entry['warm_total']}s, "
              f"{len(entry['queries'])} queries -> {HISTORY}")
    if len(history) >= 2:
        compare(history[-2], history[-1])
    elif sys.argv[1] == "check":
        print("need at least two recorded entries to compare")


if __name__ == "__main__":
    main()
