#!/usr/bin/env python3
"""Dev-loop stand-in for the driver's DuckDB correctness gate.

Usage: compare_oracle.py <sf_dir> <verify_out_dir>

Reads each <verify_out_dir>/<name>/ parquet (Spark result) and runs
<verify_out_dir>/oracle_sql.json[name] in DuckDB with views over the
<sf_dir> parquet tables; compares row counts, column names, and values
(columns sorted by name, floats rounded to 6dp).
"""
import json
import math
import sys

import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for row in rows:
        r = []
        for i in order:
            v = row[i]
            if isinstance(v, float):
                v = round(v, 6)
                if v == 0:
                    v = 0.0
                if isinstance(v, float) and math.isnan(v):
                    v = "NaN"
            r.append(str(v))
        out.append(tuple(r))
    return out


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        sql = oracle[name]
        try:
            odf = con.execute(sql)
            ocols = [d[0] for d in odf.description]
            orows = odf.fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {str(e).splitlines()[0]}")
            n_fail += 1
            continue
        try:
            sdf = con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
            scols = [d[0] for d in sdf.description]
            srows = sdf.fetchall()
        except Exception as e:
            print(f"FAIL {name}: spark result unreadable: {str(e).splitlines()[0]}")
            n_fail += 1
            continue
        if sorted(scols) != sorted(ocols):
            print(f"FAIL {name}: columns differ spark={sorted(scols)} oracle={sorted(ocols)}")
            n_fail += 1
            continue
        if len(srows) != len(orows):
            print(f"FAIL {name}: rows spark={len(srows)} oracle={len(orows)}")
            n_fail += 1
            continue
        cs, co = canon(srows, scols), canon(orows, ocols)
        if cs != co:
            bad = [i for i, (a, b) in enumerate(zip(cs, co)) if a != b][:3]
            print(f"FAIL {name}: {len([1 for a,b in zip(cs,co) if a!=b])}/{len(cs)} rows differ; first at {bad}")
            for i in bad:
                print(f"  spark : {cs[i]}")
                print(f"  oracle: {co[i]}")
            n_fail += 1
            continue
        print(f"PASS {name} ({len(srows)} rows)")
        n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
