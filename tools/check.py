#!/usr/bin/env python3
"""Dev-only oracle self-check (mimics the driver's t2 gate; NOT part of the
engine). Usage:
    sbt "runMain graft.Verify /root/testdata/sf0.01 /tmp/verify_out"
    python3 tools/check.py /root/testdata/sf0.01 /tmp/verify_out [report.json]
Compares each Spark result parquet against the DuckDB oracle SQL: columns
sorted by name, rows sorted, exact value match (floats reported with max
abs diff when unequal).

Every oracle is timed, and any single oracle slower than ORACLE_BUDGET_SEC
(default 5 s — override with --budget N) FAILS the run. This is the
mechanical guard against the round-9 regression class: ONE un-materialized
multi-reference CTE chain once inflated the driver's gate from ~30 s to
~15 min (p01 at 850 s) and the gate came back empty. A budget failure
means: add `AS MATERIALIZED` to the offending oracle's multiply-referenced
CTEs (profile with tools/profile_oracle.py).
"""
import json, math, sys, time
import duckdb

ORACLE_BUDGET_SEC = 5.0

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def canon(df):
    cols = sorted(df.columns)
    df = df[cols]
    df = df.sort_values(by=cols, kind="mergesort", na_position="first").reset_index(drop=True)
    return df

def cmp_cell(a, b):
    if a is None and b is None:
        return True
    try:
        import pandas as pd
        an, bn = pd.isna(a), pd.isna(b)
        if isinstance(an, bool) and isinstance(bn, bool) and (an or bn):
            return an and bn  # NaT/NaN/None on both sides counts as equal
    except (TypeError, ValueError):
        pass
    try:
        if isinstance(a, float) or isinstance(b, float):
            if a is None or b is None:
                return False
            if math.isnan(a) and math.isnan(b):
                return True
            return a == b
    except TypeError:
        pass
    return a == b

def main(sf_dir, out_dir, json_path=None, budget=ORACLE_BUDGET_SEC):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    report = {}
    failures = 0
    over_budget = []
    t_start = time.time()
    for name, sql in sorted(oracle.items()):
        t_oracle = time.time()
        try:
            exp = canon(con.sql(sql).df())
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            report[name] = {"status": "fail", "reason": f"oracle SQL error: {e}"}
            failures += 1
            continue
        oracle_sec = time.time() - t_oracle
        if oracle_sec > budget:
            over_budget.append((name, oracle_sec))
        try:
            got = canon(con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df())
        except Exception as e:
            print(f"FAIL {name}: spark output missing/unreadable: {e}")
            report[name] = {"status": "fail", "reason": f"spark output missing: {e}"}
            failures += 1
            continue
        if list(exp.columns) != list(got.columns):
            print(f"FAIL {name}: columns exp={list(exp.columns)} got={list(got.columns)}")
            report[name] = {"status": "fail", "reason": "column mismatch"}
            failures += 1
            continue
        dt = [(c, str(exp[c].dtype), str(got[c].dtype)) for c in exp.columns
              if str(exp[c].dtype) != str(got[c].dtype)]
        if dt:
            print(f"FAIL {name}: dtype mismatch {dt}")
            report[name] = {"status": "fail", "reason": f"dtype mismatch {dt}"}
            failures += 1
            continue
        if len(exp) != len(got):
            print(f"FAIL {name}: rows exp={len(exp)} got={len(got)}")
            report[name] = {"status": "fail", "reason": f"rows exp={len(exp)} got={len(got)}"}
            failures += 1
            continue
        bad = None
        maxdiff = 0.0
        for c in exp.columns:
            ev, gv = exp[c].tolist(), got[c].tolist()
            for i, (a, b) in enumerate(zip(ev, gv)):
                if not cmp_cell(a, b):
                    if isinstance(a, float) and isinstance(b, float):
                        maxdiff = max(maxdiff, abs(a - b))
                    if bad is None:
                        bad = (c, i, a, b)
        if bad:
            c, i, a, b = bad
            extra = f" maxfloatdiff={maxdiff:.3e}" if maxdiff else ""
            print(f"FAIL {name}: first diff col={c} row={i} exp={a!r} got={b!r}{extra}")
            report[name] = {"status": "fail",
                            "reason": f"value diff col={c} row={i}{extra}"}
            failures += 1
        else:
            print(f"OK   {name} ({len(exp)} rows)")
            report[name] = {"status": "ok", "rows": len(exp),
                            "oracle_sec": round(oracle_sec, 2)}
    # rows-only queries (no oracle): just confirm output exists
    import os
    for d in sorted(os.listdir(out_dir)):
        p = os.path.join(out_dir, d)
        if os.path.isdir(p) and d not in oracle:
            try:
                n = con.sql(f"SELECT count(*) FROM '{p}/*.parquet'").fetchone()[0]
                print(f"OK?  {d} (rows-only, {n} rows)")
                report[d] = {"status": "rows_only", "rows": int(n)}
            except Exception as e:
                print(f"FAIL {d}: rows-only output unreadable: {e}")
                report[d] = {"status": "fail", "reason": "rows-only unreadable"}
                failures += 1
    # budget gate: a single slow oracle is a FAILURE even when it matches
    # — it is next round's empty driver artifact
    for name, sec in over_budget:
        print(f"FAIL {name}: oracle took {sec:.1f}s > {budget:.0f}s budget "
              "(add AS MATERIALIZED to its multiply-referenced CTEs; "
              "profile with tools/profile_oracle.py)")
        failures += 1
        if name in report and report[name].get("status") == "ok":
            report[name] = {"status": "fail",
                            "reason": f"oracle over budget: {sec:.1f}s > {budget:.0f}s",
                            "oracle_sec": round(sec, 2)}
    print(f"\n{'ALL GREEN' if failures == 0 else str(failures) + ' FAILURES'}")
    if json_path:
        summary = {"sf_dir": sf_dir, "out_dir": out_dir,
                   "n_queries": len(report), "n_failures": failures,
                   "wall_sec": round(time.time() - t_start, 1),
                   "oracle_budget_sec": budget,
                   "all_green": failures == 0, "queries": report}
        with open(json_path, "w") as f:
            json.dump(summary, f, indent=1, sort_keys=True)
        print(f"wrote {json_path}")
    return 1 if failures else 0

if __name__ == "__main__":
    args = list(sys.argv[1:])
    budget = ORACLE_BUDGET_SEC
    if "--budget" in args:
        i = args.index("--budget")
        budget = float(args[i + 1])
        del args[i:i + 2]
    sf = args[0] if len(args) > 0 else "/root/testdata/sf0.01"
    out = args[1] if len(args) > 1 else "/tmp/verify_out"
    jp = args[2] if len(args) > 2 else None
    sys.exit(main(sf, out, jp, budget))
