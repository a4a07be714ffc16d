"""One-shot driver-contract verify (the /verify recipe as a script)."""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import __spark_entry__ as e
from graphdatabase_spark import get_spark
import duckdb

spark = get_spark("verify-run",
                  extra_conf={"spark.ui.showConsoleProgress": "false"})
spark.sparkContext.setLogLevel("ERROR")
print("ENTRY rows:", len(e.entry(spark).collect()), flush=True)
sf = "/root/testdata/sf0.01"
con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{sf}/{t}.parquet')")
qs, osql = e.queries(), e.oracle_sql()
fails = 0
for name, fn in sorted(qs.items()):
    got = fn(spark, sf).toPandas()
    if name not in osql:
        print(f"{name}: rows={len(got)} (rows-only)", flush=True)
        continue
    want = con.execute(osql[name]).fetchdf()
    got, want = got[sorted(got.columns)], want[sorted(want.columns)]
    ok = list(got.columns) == list(want.columns) and len(got) == len(want)
    if ok:
        g = got.sort_values(by=list(got.columns),
                            kind="mergesort").reset_index(drop=True)
        w = want.sort_values(by=list(want.columns),
                             kind="mergesort").reset_index(drop=True)
        ok = g.astype(str).equals(w.astype(str))
    if not ok:
        print(f"FAIL {name}: rows={len(got)}/{len(want)}", flush=True)
        fails += 1
print("CHECKED:", len(qs), "FAILS:", fails, flush=True)
