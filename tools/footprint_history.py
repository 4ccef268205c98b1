#!/usr/bin/env python3
"""Per-round x30 FOOTPRINT ratchet: skew (max/avg task shuffle read),
peak task memory, and spill, with automatic WARN flags.

SCALING.md's r12 skew table showed per-task concentration growing
~n^0.3-0.4 on the pair family — the straggler axis a local wall clock
never shows (31 other cores hide one hot task; on a 1000-executor
cluster that task IS the wall). r13 turns that table into an enforced
close-out check, warm_history.py-style: record the round's x30
Footprint run, and any query whose skew exceeds its documented
cap-derived bound, grows >1.5x round-over-round, whose peak task memory
grows >1.3x, or whose disk spill newly appears (>1 GiB where the
previous round had none) prints a WARN that needs an adjudication note
in tools/bench_history.md (or a fix) before close-out.

Usage:
  python3 tools/footprint_history.py record <label> [FOOTPRINT.json]
      # append the given footprint (default ./FOOTPRINT.json) as <label>
  python3 tools/footprint_history.py check
      # re-compare the last two entries

Exit code: 0 on success (flags included — a flag demands adjudication,
not an automatic failure); 2 on usage errors.
"""
import json
import os
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
HISTORY = os.path.join(HERE, "footprint_history.json")
SKEW_GROWTH = 1.5     # round-over-round max/avg growth flag (judge r12 #2)
PEAK_GROWTH = 1.3     # round-over-round peak-task-memory growth flag
PEAK_FLOOR = 64 << 20  # ignore peak ratios under 64 MiB (allocator noise)
READ_FLOOR = 8 << 20   # skew undefined below 8 MiB total shuffle read
MAX_FLOOR = 16 << 20   # skew ratio only meaningful when the hottest task
#                        itself reads >= 16 MiB — a 4 MiB "hot" task is
#                        not a straggler wall at any ratio (q_dedup_semantic
#                        measures max/avg 18 on a 4 MiB task; irrelevant)
SPILL_NEW = 1 << 30    # flag spill that newly exceeds 1 GiB

# Documented cap-derived skew bounds (SCALING.md "Per-task skew" table,
# r13 basis): each hot task is bounded by an explicit cap in the code
# (population guards on (lang, band) blocks; 8x-block-cap bucket caps on
# the LSH candidate streams), so max/avg may breathe with replication
# but must stay under ~1.5x the measured x30 concentration. A breach
# means a cap stopped binding — adjudicate against the cap, not the
# wall clock. Basis note: the r12 SCALING table rows (e.g.
# q_dedup_ngram_auto 5.9) were measured MID-r12, before that round's
# checkpoint-broadcast removals moved the re-attach bytes into the
# shuffle; the r13 HEAD re-measurement (byte-identical across two runs)
# is the bound-setting baseline.
SKEW_BOUNDS = {
    "q_substring_dup_fast": 3.5,   # 2.06 measured x30 @ r13
    "q_minhash_lsh": 8.5,          # 5.72
    "q_dedup_ngram_auto": 13.5,    # 9.10
    "q_dedup_ngram": 9.5,          # 6.30
    "q_containment": 11.5,         # 7.53
    "q_dedup_lsh_verified": 7.0,   # 4.45
}

# r15 (judge #2): the steep-skew pair family gets its own x90 chain —
# the concentration axis grows ~n^0.3-0.4, so an x30 bound applied to an
# x90 run would flag legitimate growth (and a bound loose enough for
# x90 would mask an x30 regression). Bounds = r15 measured x90 skew
# x ~1.5 headroom, same derivation as the x30 table (SCALING.md "Per-
# task skew", r15 x90 rows). Selected by the entry's sf path.
# q_dedup_ngram_auto has NO x90 row: the declared quadratic demo's x90
# shuffle exceeds this host's ~78 GB free disk (serial run, No space
# left on device — SCALING.md r15) — the production twin
# (q_dedup_auto_clusters, 1.98 GB shuffle / 0 spill at x90) is the
# linear contract and IS chained here.
SKEW_BOUNDS_X90 = {
    "q_substring_dup_fast": 3.5,   # 2.18 measured x90 @ r15
    "q_minhash_lsh": 8.5,          # 5.67 (5.7-6.2 across runs)
    "q_containment": 9.5,          # below the 16 MiB max-task floor at
    #                                x90 (implied 6.3 if it crossed it)
}


def bounds_for(sf):
    return SKEW_BOUNDS_X90 if sf and "x90" in sf else SKEW_BOUNDS


def load_history():
    if not os.path.exists(HISTORY):
        return []
    with open(HISTORY) as f:
        return json.load(f)


def derive(raw):
    """FOOTPRINT.json row -> the ratcheted signals."""
    tasks = max(raw.get("tasks", 0), 1)
    read = raw.get("shuffle_read", 0)
    mx = raw.get("max_task_shuffle_read", 0)
    skew = (mx / (read / tasks)
            if read >= READ_FLOOR and mx >= MAX_FLOOR else None)
    return {
        "skew": round(skew, 2) if skew is not None else None,
        "max_task_read": raw.get("max_task_shuffle_read", 0),
        "peak_task_mem": raw.get("peak_task_mem", 0),
        "spill_disk": raw.get("spill_disk", 0),
        "shuffle_read": read,
        "tasks": raw.get("tasks", 0),
    }


def compare(prev, cur):
    flags = 0
    pq, cq = prev["queries"], cur["queries"]
    print(f"footprints: {prev['label']} ({len(pq)} queries, sf={prev['sf']})"
          f" -> {cur['label']} ({len(cq)} queries, sf={cur['sf']})")
    # coverage shrinkage needs the same adjudication as a metric
    # regression (r13 ADVICE): a query dropped from the run list would
    # otherwise silently exit the ratchet
    for name in sorted(set(pq) - set(cq)):
        print(f"WARN {name}: present in {prev['label']} but missing from "
              f"{cur['label']} — footprint coverage shrank")
        flags += 1
    for name in sorted(cq):
        c = cq[name]
        p = pq.get(name)
        if c["skew"] is not None:
            bound = bounds_for(cur.get("sf")).get(name)
            if bound is not None and c["skew"] > bound:
                print(f"WARN {name}: skew {c['skew']:.1f} exceeds documented "
                      f"cap-derived bound {bound} (SCALING.md skew table)")
                flags += 1
            if (p and p.get("skew") and c["skew"] > SKEW_GROWTH * p["skew"]
                    and c["skew"] > 2.0):
                print(f"WARN {name}: skew {p['skew']:.1f} -> {c['skew']:.1f} "
                      f"(>{SKEW_GROWTH}x round-over-round)")
                flags += 1
        if p:
            if (c["peak_task_mem"] > PEAK_FLOOR
                    and c["peak_task_mem"] > PEAK_GROWTH * max(p["peak_task_mem"], 1)):
                print(f"WARN {name}: peak task mem "
                      f"{p['peak_task_mem'] >> 20} -> {c['peak_task_mem'] >> 20} MiB "
                      f"(>{PEAK_GROWTH}x)")
                flags += 1
            if c["spill_disk"] > SPILL_NEW and p["spill_disk"] < SPILL_NEW // 4:
                print(f"WARN {name}: disk spill newly "
                      f"{c['spill_disk'] >> 20} MiB (prev "
                      f"{p['spill_disk'] >> 20} MiB)")
                flags += 1
    print(f"FLAGS: {flags}")
    return flags


def main():
    if len(sys.argv) < 2 or sys.argv[1] not in ("record", "check"):
        print(__doc__)
        return
    history = load_history()
    if sys.argv[1] == "record":
        if len(sys.argv) < 3 or not sys.argv[2].strip():
            print("usage: footprint_history.py record <label> [FOOTPRINT.json]")
            sys.exit(2)
        label = sys.argv[2]
        path = sys.argv[3] if len(sys.argv) > 3 else os.path.join(
            os.path.dirname(HERE), "FOOTPRINT.json")
        if not os.path.exists(path):
            print(f"{path} not found — run the x30 Footprint step first "
                  "(see CLAUDE.md close-out order)")
            sys.exit(2)
        with open(path) as f:
            fp = json.load(f)
        entry = {
            "label": label,
            "sf": fp.get("sf"),
            "queries": {k: derive(v) for k, v in fp["queries"].items()},
        }
        history = [e for e in history if e["label"] != label] + [entry]
        with open(HISTORY, "w") as f:
            json.dump(history, f, indent=1, sort_keys=True)
        print(f"recorded {label}: {len(entry['queries'])} queries -> {HISTORY}")
    if not history:
        print("no recorded entries")
        return
    # r14 (judge #6): the ratchet carries MULTIPLE scale families — the
    # per-round x30 pair-family run and the x90 linear-contract row —
    # so comparisons pair the newest entry with the previous entry of
    # the SAME corpus (sf path); an x90 row must never ratchet against
    # an x30 baseline.
    cur = history[-1]
    chain = [e for e in history if e.get("sf") == cur.get("sf")]
    if len(chain) >= 2:
        compare(chain[-2], chain[-1])
    else:
        # first entry of its family: still enforce the absolute
        # documented bounds
        compare(chain[-1], chain[-1])


if __name__ == "__main__":
    main()
