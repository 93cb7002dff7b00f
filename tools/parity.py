#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB correctness gate.

Usage: python3 tools/parity.py <sfDir> <verifyOutDir> [query ...]

Reads <verifyOutDir>/oracle_sql.json, runs each oracle against the parquet
tables in <sfDir> via DuckDB, loads the Spark result parquet from
<verifyOutDir>/<name>/, sorts columns by name and rows by value, and
compares cell-by-cell (floats to 9 significant digits).
"""
import json, math, sys
import duckdb

def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        rr = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                v = float(f"{v:.9g}") if math.isfinite(v) else repr(v)
            rr.append(v)
        out.append(tuple(rr))
    out.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
    return [cols[i] for i in order], out

def main():
    sf, outdir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    fails = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        try:
            o = con.sql(sql)
            ocols, orows = o.columns, o.fetchall()
            s = con.sql(f"SELECT * FROM '{outdir}/{name}/*.parquet'")
            scols, srows = s.columns, s.fetchall()
            oc, orws = canon(orows, ocols)
            sc, srws = canon(srows, scols)
            if [c.lower() for c in oc] != [c.lower() for c in sc]:
                print(f"FAIL {name}: cols oracle={oc} spark={sc}"); fails += 1
            elif orws != srws:
                diff = [(a, b) for a, b in zip(orws, srws) if a != b][:3]
                print(f"FAIL {name}: rows oracle={len(orws)} spark={len(srws)} first_diffs={diff}")
                fails += 1
            else:
                print(f"ok   {name} ({len(srws)} rows)")
        except Exception as e:
            print(f"ERR  {name}: {e}"); fails += 1
    sys.exit(1 if fails else 0)

main()
