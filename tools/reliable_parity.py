#!/usr/bin/env python3
"""Mint RELIABLE_LINEAGE_PARITY.json from a reliable-mode Verify run.

The Lineage.cut seam (src/main/scala/graft/operators/Lineage.scala)
switches ~30 lineage-truncation call sites between localCheckpoint
(default) and reliable checkpoint() under one conf. r14 proved mode
parity on two queries; this gate (judge r15 #1) proves it for the WHOLE
library: the full declared set runs through Verify with
SPARK_GRAFT_CHECKPOINT_DIR set, check.py hash-matches every oracle-
checked query against DuckDB, and this script converts that evidence
into the committed artifact — refusing to mint one when

  - the verify log lacks the "[verify] reliable-lineage mode" marker
    (the conf never took effect: the run was default-mode, proving
    nothing),
  - the checkpoint dir contains no rdd-* checkpoint data (no cut
    actually wrote through the reliable store), or
  - check.py reported failures (parity is the 0-failure claim).

Usage:
  SPARK_GRAFT_CHECKPOINT_DIR=/tmp/graft_reliable_ckpt \
    sbt -batch "runMain graft.Verify /root/testdata/sf0.01 /tmp/verify_reliable" \
    | tee /tmp/verify_reliable.log
  python3 tools/check.py /root/testdata/sf0.01 /tmp/verify_reliable \
    | tee /tmp/check_reliable.log
  python3 tools/reliable_parity.py r<N> /tmp/verify_reliable.log \
    /tmp/check_reliable.log <checkpoint_dir> <outDir>
"""
import glob
import json
import os
import re
import sys
import time


def main():
    if len(sys.argv) != 6:
        print(__doc__)
        sys.exit(2)
    label, verify_log, check_log, ckpt_dir, out_dir = sys.argv[1:6]

    vlog = open(verify_log).read()
    m = re.search(r"\[verify\] reliable-lineage mode: ([^=]+)=(\S+)", vlog)
    if not m:
        print("REFUSED: verify log has no reliable-lineage marker — the "
              "run was default (localCheckpoint) mode and proves nothing")
        sys.exit(1)
    conf_key, conf_dir = m.group(1), m.group(2)
    failed_queries = re.findall(r"\[verify\] (\S+) failed:", vlog)

    # physical evidence: reliable cuts write rdd-* data under
    # <dir>/<context-uuid>/ — an empty dir means no cut site ever engaged
    rdds = glob.glob(os.path.join(ckpt_dir, "*", "rdd-*"))
    if not rdds:
        print(f"REFUSED: no rdd-* checkpoint data under {ckpt_dir} — "
              "no Lineage.cut wrote through the reliable store")
        sys.exit(1)

    ok = fail = 0
    failures = []
    for line in open(check_log):
        if line.startswith("OK "):
            ok += 1
        elif line.startswith(("FAIL ", "WARN ")):
            fail += 1
            failures.append(line.strip()[:200])
    mf = re.search(r"FAILURES: (\d+)", open(check_log).read())
    if not mf:
        print("REFUSED: check log has no FAILURES line — check.py did not "
              "complete")
        sys.exit(1)
    declared_failures = int(mf.group(1))

    sweep_path = os.path.join(out_dir, "runtime_sweep.json")
    sweep = json.load(open(sweep_path)) if os.path.exists(sweep_path) else {}

    report = {
        "label": label,
        "mode": f"{conf_key}={conf_dir}",
        "generated": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        "checkpoint_rdds_written": len(rdds),
        "queries_ok": ok,
        "check_failures": declared_failures,
        "verify_errors": failed_queries,
        "failures": failures,
        "runtime_sweep": {
            "executions_total": sweep.get("executions_total"),
            "unexplained_total": sweep.get("unexplained_total"),
            "detector_errors": sweep.get("detector_errors"),
        },
        "status": "PASS" if declared_failures == 0 and not failed_queries
                  else "FAIL",
    }
    with open("RELIABLE_LINEAGE_PARITY.json", "w") as f:
        json.dump(report, f, indent=1)
        f.write("\n")
    print(f"RELIABLE_LINEAGE_PARITY.json: {ok} OK rows, "
          f"{declared_failures} failures, {len(rdds)} reliable checkpoint "
          f"RDDs written -> {report['status']}")
    sys.exit(0 if report["status"] == "PASS" else 1)


if __name__ == "__main__":
    main()
