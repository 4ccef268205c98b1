#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage: after `sbt "runMain graft.Verify <sfDir> <outDir>"`, run
    python3 tools/check.py <sfDir> <outDir>
Compares each <outDir>/<name> parquet result against the DuckDB oracle in
<outDir>/oracle_sql.json (columns sorted by name, rows sorted, exact values).
"""
import duckdb, glob, json, sys
import pandas as pd
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")
    oracle = json.load(open(f"{out}/oracle_sql.json"))
    fail = 0
    # rows-only queries (no oracle): the driver still LOADS these into
    # pandas and runs its sort/hash path, so an array/map/struct output
    # column crashes its whole row (r6: q_doc_profile_fast, TypeError
    # unhashable numpy.ndarray). Mirror that here: load + sort_values
    # over every column, and fail on anything pandas cannot order.
    import os
    for d in sorted(os.listdir(out)):
        if d in oracle or not os.path.isdir(f"{out}/{d}"):
            continue
        files = sorted(glob.glob(f"{out}/{d}/*.parquet"))
        n = sum(pq.read_metadata(f).num_rows for f in files) if files else 0
        if n == 0:
            fail += 1
            print(f"WARN {d} (rows-only, 0 rows)")
            continue
        try:
            df = pd.concat([pq.read_table(p).to_pandas() for p in files],
                           ignore_index=True)
            df[sorted(df.columns)].sort_values(by=sorted(df.columns))
        except Exception as e:
            fail += 1
            print(f"FAIL {d} (rows-only): driver sort/hash would crash: "
                  f"{type(e).__name__}: {str(e)[:200]}")
            continue
        print(f"OK   {d} (rows-only, {n} rows)")
    for name, sql in sorted(oracle.items()):
        files = sorted(glob.glob(f"{out}/{name}/*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark output"); fail += 1; continue
        spark_df = pd.concat([pq.read_table(p).to_pandas() for p in files],
                             ignore_index=True)
        try:
            rel = con.sql(sql)
            # The driver's hash is type-sensitive: a DuckDB HUGEINT column
            # (bare SUM over integers) never matches Spark's BIGINT even when
            # values agree. Catch it at the source.
            huge = [c for c, t in zip(rel.columns, rel.types)
                    if str(t).upper() in ("HUGEINT", "UHUGEINT")]
            if huge:
                print(f"FAIL {name}: oracle emits HUGEINT column(s) {huge} — "
                      f"wrap in CAST(... AS BIGINT)")
                fail += 1; continue
            duck_df = rel.df()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}"); fail += 1; continue
        a = spark_df[sorted(spark_df.columns)]
        b = duck_df[sorted(duck_df.columns)]
        if list(a.columns) != list(b.columns):
            print(f"FAIL {name}: cols {list(a.columns)} vs {list(b.columns)}")
            fail += 1; continue
        cols = list(a.columns)
        # dtype-kind compare (was check_dtype=False, which let HUGEINT→object
        # drift through). Allow int-vs-float only for nullable-int promotion
        # (pandas turns a nullable int column into float64 with NaN).
        for c in cols:
            ka, kb = a[c].dtype.kind, b[c].dtype.kind
            if ka == kb:
                continue
            numeric = {"i", "u", "f"}
            promoted = (ka in numeric and kb in numeric and
                        (a[c].isna().any() or b[c].isna().any()))
            if not promoted:
                print(f"FAIL {name}: dtype mismatch on '{c}': "
                      f"spark {a[c].dtype} vs oracle {b[c].dtype}")
                fail += 1; break
        else:
            a = a.sort_values(by=cols).reset_index(drop=True)
            b = b.sort_values(by=cols).reset_index(drop=True)
            if len(a) != len(b):
                print(f"FAIL {name}: rows {len(a)} vs {len(b)}"); fail += 1
                continue
            try:
                pd.testing.assert_frame_equal(a, b, check_dtype=False,
                                              check_exact=True)
                print(f"OK   {name} ({len(a)} rows)")
            except AssertionError as e:
                print(f"FAIL {name}: {str(e)[:400]}"); fail += 1
    # r14: the runtime plan sweep's "must be 0" contract is machine-
    # enforced here (the local gate), not just printed by Verify — an
    # unexplained executed-plan hit or a throwing detector fails the
    # round like an oracle mismatch would. The gate reads the RUN-BOUND
    # copy Verify writes into outDir: the committed cwd RUNTIME_SWEEP.json
    # is always-green by construction, so gating on it would let an
    # aborted run (or a check from the wrong directory) pass on stale
    # data. A missing run-bound report is itself a FAIL — a sweep that
    # did not run is not a sweep that passed.
    sweep_path = os.path.join(out, "runtime_sweep.json")
    if os.path.exists(sweep_path):
        sweep = json.load(open(sweep_path))
        unexp = sweep.get("unexplained_total", 0)
        errs = sweep.get("detector_errors", 0)
        if unexp or errs:
            print(f"FAIL runtime sweep: {unexp} unexplained hits, "
                  f"{errs} detector errors ({sweep_path})")
            fail += 1
        else:
            print(f"OK   runtime sweep ({sweep.get('executions_total')} "
                  "executed subplans, 0 unexplained, 0 detector errors)")
    else:
        print(f"FAIL runtime sweep: no run-bound report at {sweep_path} "
              "(Verify aborted before the sweep, or outDir predates r14)")
        fail += 1
    print("FAILURES:", fail)
    sys.exit(1 if fail else 0)

if __name__ == "__main__":
    main()
