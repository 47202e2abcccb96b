#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run each oracle SQL in
DuckDB over the testdata parquet, compare against the Spark result parquet
dumped by graft.Verify. Strict: sorts columns by name, sorts rows, compares
cell-by-cell (floats must be bit-identical unless --tol is given)."""
import duckdb, json, math, sys, glob, os

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
fails = 0
for name in sorted(oracle):
    sql = oracle[name]
    spark_path = f"{out_dir}/{name}"
    if not os.path.isdir(spark_path):
        print(f"FAIL {name}: no spark output"); fails += 1; continue
    try:
        duck = con.execute(sql).fetchdf()
    except Exception as e:
        print(f"FAIL {name}: duckdb error: {str(e)[:200]}"); fails += 1; continue
    spk = con.execute(f"SELECT * FROM '{spark_path}/*.parquet'").fetchdf()
    duck = duck.reindex(sorted(duck.columns), axis=1)
    spk = spk.reindex(sorted(spk.columns), axis=1)
    if list(duck.columns) != list(spk.columns):
        print(f"FAIL {name}: cols duck={list(duck.columns)} spark={list(spk.columns)}"); fails += 1; continue
    if len(duck) != len(spk):
        print(f"FAIL {name}: rows duck={len(duck)} spark={len(spk)}"); fails += 1; continue
    duck = duck.sort_values(list(duck.columns)).reset_index(drop=True)
    spk = spk.sort_values(list(spk.columns)).reset_index(drop=True)
    bad = None
    for c in duck.columns:
        for i, (a, b) in enumerate(zip(duck[c], spk[c])):
            ia, ib = a != a if isinstance(a, float) else False, b != b if isinstance(b, float) else False
            if ia and ib: continue
            if hasattr(a, 'item'): a = a.item()
            if hasattr(b, 'item'): b = b.item()
            if isinstance(a, float) or isinstance(b, float):
                if a != b:
                    bad = (c, i, a, b); break
            elif str(a) != str(b):
                bad = (c, i, a, b); break
        if bad: break
    if bad:
        print(f"FAIL {name}: col={bad[0]} row={bad[1]} duck={bad[2]!r} spark={bad[3]!r}"); fails += 1
    else:
        print(f"ok   {name} ({len(duck)} rows)")
print(f"\n{len(oracle)-fails}/{len(oracle)} queries match")
sys.exit(1 if fails else 0)
