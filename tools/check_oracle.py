#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: load each Verify
parquet output, run the matching oracle SQL in DuckDB against the
testdata tables, and compare (columns sorted by name, rows sorted,
values compared elementwise). Dev tool only — the shipped library is
pure Scala/Spark."""
import sys, json, glob, math
import duckdb
import pandas as pd

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))

def canon(df):
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df

def values_equal(a, b):
    if a is None and b is None: return True
    if pd.isna(a) and pd.isna(b): return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b): return True
        # driver compares HASHES of the serialized values, so -0.0 vs
        # 0.0 must fail here too (they are == but hash differently)
        if a == 0.0 and b == 0.0:
            return math.copysign(1.0, a) == math.copysign(1.0, b)
        return a == b
    return str(a) == str(b)

fails = 0
for name in sorted(oracle):
    files = glob.glob(f"{out_dir}/{name}/*.parquet")
    if not files:
        print(f"FAIL {name}: no spark output"); fails += 1; continue
    spark_df = canon(pd.concat([pd.read_parquet(f) for f in files]))
    try:
        duck_df = canon(con.sql(oracle[name]).df())
    except Exception as e:
        print(f"FAIL {name}: oracle error: {e}"); fails += 1; continue
    if list(spark_df.columns) != list(duck_df.columns):
        print(f"FAIL {name}: cols spark={list(spark_df.columns)} duck={list(duck_df.columns)}")
        fails += 1; continue
    if len(spark_df) != len(duck_df):
        print(f"FAIL {name}: rows spark={len(spark_df)} duck={len(duck_df)}")
        fails += 1; continue
    bad = None
    for c in spark_df.columns:
        sv, dv = spark_df[c].tolist(), duck_df[c].tolist()
        for i, (a, b) in enumerate(zip(sv, dv)):
            if not values_equal(a, b):
                bad = (c, i, a, b); break
        if bad: break
    if bad:
        c, i, a, b = bad
        print(f"FAIL {name}: col {c} row {i}: spark={a!r} ({type(a).__name__}) duck={b!r} ({type(b).__name__})")
        fails += 1
    else:
        print(f"PASS {name} ({len(spark_df)} rows)")

# queries without oracle → rows-only
import os
for d in sorted(os.listdir(out_dir)):
    if d in oracle or not os.path.isdir(f"{out_dir}/{d}"): continue
    files = glob.glob(f"{out_dir}/{d}/*.parquet")
    n = sum(len(pd.read_parquet(f)) for f in files) if files else 0
    marker = " (RUNTIME ERROR)" if os.path.exists(f"{out_dir}/{d}/_ERROR.txt") else ""
    if marker: fails += 1
    print(f"ROWS {d}: {n}{marker}")

# Verify's failure manifest: every thrown query is a red row here, and
# the dumped-key count must equal the attempted count (r10 verdict —
# sink_compact/sink_upsert VANISHED from the artifact instead of
# failing; absence is never a pass).
if os.path.exists(f"{out_dir}/_failures.json"):
    m = json.load(open(f"{out_dir}/_failures.json"))
    for name, msg in sorted(m.get("failed", {}).items()):
        print(f"FAIL {name}: runtime error: {msg}")
        if name in oracle or os.path.exists(f"{out_dir}/{name}/_ERROR.txt"):
            pass  # already counted above
        else:
            fails += 1
    dumped = sum(1 for d in os.listdir(out_dir)
                 if os.path.isdir(f"{out_dir}/{d}")
                 and glob.glob(f"{out_dir}/{d}/*.parquet"))
    if dumped + len(m.get("failed", {})) != m.get("attempted", dumped):
        print(f"FAIL manifest: attempted={m.get('attempted')} but "
              f"dumped={dumped} + failed={len(m.get('failed', {}))}")
        fails += 1
print(f"\n{fails} failures")
sys.exit(1 if fails else 0)
