#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 tools/check.py <sfdir> <verify_out_dir>

Reads each <verify_out_dir>/<name> parquet (Spark result), runs the oracle
SQL from oracle_sql.json in DuckDB over the sfdir parquet tables, sorts
columns by name, and compares row-by-row. Reports per-query PASS/FAIL with
first diffs.
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.10g}"
    return str(v)


def main(sfdir, outdir, json_out=None):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracles = json.load(open(f"{outdir}/oracle_sql.json"))
    n_pass = n_fail = 0
    results = {}
    for name, sql in sorted(oracles.items()):
        try:
            exp = con.execute(sql).fetchdf()
            got = con.execute(
                f"SELECT * FROM '{outdir}/{name}/*.parquet'").fetchdf()
            exp = exp[sorted(exp.columns)]
            got = got[sorted(got.columns)]
            if list(exp.columns) != list(got.columns):
                print(f"FAIL {name}: columns exp={list(exp.columns)} "
                      f"got={list(got.columns)}")
                results[name] = {"status": "fail", "detail": "columns"}
                n_fail += 1
                continue
            dt_bad = [(c, str(exp[c].dtype), str(got[c].dtype))
                      for c in exp.columns
                      if str(exp[c].dtype) != str(got[c].dtype)]
            if dt_bad:
                print(f"FAIL {name}: dtype mismatch {dt_bad}")
                results[name] = {"status": "fail", "detail": "dtype"}
                n_fail += 1
                continue
            if len(exp) != len(got):
                print(f"FAIL {name}: rows exp={len(exp)} got={len(got)}")
                results[name] = {"status": "fail", "detail": "rowcount"}
                n_fail += 1
                continue
            bad = None
            ev = exp.values.tolist()
            gv = got.values.tolist()
            for i, (er, gr) in enumerate(zip(ev, gv)):
                for c, (a, b) in enumerate(zip(er, gr)):
                    if norm(a) != norm(b):
                        bad = (i, exp.columns[c], a, b)
                        break
                if bad:
                    break
            if bad:
                print(f"FAIL {name}: row {bad[0]} col {bad[1]}: "
                      f"oracle={bad[2]!r} spark={bad[3]!r}")
                results[name] = {"status": "fail",
                                 "detail": f"value@{bad[0]}/{bad[1]}"}
                n_fail += 1
            else:
                print(f"PASS {name} ({len(exp)} rows)")
                results[name] = {"status": "pass", "rows": len(exp)}
                n_pass += 1
        except Exception as e:
            print(f"ERROR {name}: {type(e).__name__}: {e}")
            results[name] = {"status": "error",
                             "detail": f"{type(e).__name__}: {e}"[:200]}
            n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    if json_out:
        with open(json_out, "w") as f:
            json.dump({"sfdir": sfdir, "n_pass": n_pass, "n_fail": n_fail,
                       "keys": results}, f, indent=1, sort_keys=True)
    return 1 if n_fail else 0


if __name__ == "__main__":
    jo = None
    args = sys.argv[1:]
    if "--json" in args:
        i = args.index("--json")
        jo = args[i + 1]
        del args[i:i + 2]
    sys.exit(main(args[0], args[1], jo))
