#!/usr/bin/env python3
"""Dev-only: time each oracle SQL from <out_dir>/oracle_sql.json in DuckDB
(the check.py bottleneck is the oracle leg, not the parquet compare).
Usage: python3 tools/profile_oracle.py [sf_dir] [out_dir]
Prints one line per query sorted by cost desc, then the total.
"""
import json, sys, time
import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    times = {}
    for name, sql in sorted(oracle.items()):
        t0 = time.time()
        try:
            con.sql(sql).df()
            times[name] = time.time() - t0
        except Exception as e:
            times[name] = time.time() - t0
            print(f"ERR  {name}: {e}", flush=True)
        print(f"{times[name]:8.2f}s {name}", flush=True)
    print("---- sorted by cost ----")
    for name, t in sorted(times.items(), key=lambda kv: -kv[1])[:30]:
        print(f"{t:8.2f}s {name}")
    print(f"TOTAL {sum(times.values()):.1f}s over {len(times)} oracles")

if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/judge_verify"
    main(sf, out)
