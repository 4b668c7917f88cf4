#!/usr/bin/env python3
"""Time each oracle SQL in DuckDB (32 threads) over an sf dir, best-of-2."""
import json, sys, time
import duckdb

sf_dir, out_dir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
con.execute("SET threads TO 32")
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
times = {}
for name, sql in sorted(oracles.items()):
    best = 1e9
    for _ in range(2):
        t0 = time.time()
        con.sql(sql).fetchall()
        best = min(best, time.time() - t0)
    times[name] = best
total = sum(times.values())
# Write the file BEFORE printing: piping stdout through `head` kills the
# process with SIGPIPE mid-print, and a dump placed after the prints then
# silently leaves a STALE times file for graft.Bench's weak list.
# __sf_dir lets graft.Bench reject a times file measured at a different
# scale factor than the bench run.
out = dict(times)
out["__sf_dir"] = sf_dir
json.dump(out, open("/tmp/oracle_times.json", "w"))
print(f"TOTAL {total:.2f}")
for k, v in sorted(times.items(), key=lambda kv: -kv[1])[:15]:
    print(f"{k:30s} {v:.3f}")
