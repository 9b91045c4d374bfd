#!/usr/bin/env python3
"""Dev-loop stand-in for the driver's DuckDB correctness gate.

Usage: compare_oracle.py <sf_dir> <verify_out_dir>

Reads each <verify_out_dir>/<name>/ parquet (Spark result) and runs
<verify_out_dir>/oracle_sql.json[name] in DuckDB with views over the
<sf_dir> parquet tables; compares row counts, column names, and values
(columns sorted by name, floats rounded to 6dp).

Values go through pandas (`.df()`) on BOTH sides, like the driver's
harness, so dtype-level divergence is visible locally: e.g. a DuckDB
HUGEINT column (any un-cast SUM(BIGINT) descendant) becomes float64 in
pandas and renders "128.0" against Spark's int64 "128" — a fetchall()
comparison sees plain Python ints on both sides and hides it (caused
the round-3 q40 false-pass).
"""
import json
import math
import sys

import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon_df(df):
    """Rows as tuples of canonical strings, columns sorted by name."""
    df = df[sorted(df.columns)]
    out = []
    for row in df.itertuples(index=False, name=None):
        r = []
        for v in row:
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
            odf = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {str(e).splitlines()[0]}")
            n_fail += 1
            continue
        try:
            sdf = con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").df()
        except Exception as e:
            print(f"FAIL {name}: spark result unreadable: {str(e).splitlines()[0]}")
            n_fail += 1
            continue
        if sorted(sdf.columns) != sorted(odf.columns):
            print(f"FAIL {name}: columns differ spark={sorted(sdf.columns)} oracle={sorted(odf.columns)}")
            n_fail += 1
            continue
        if len(sdf) != len(odf):
            print(f"FAIL {name}: rows spark={len(sdf)} oracle={len(odf)}")
            n_fail += 1
            continue
        # dtype drift is the exact failure mode the driver's hash sees;
        # surface it as a warning even when the string compare passes.
        sdt = {c: str(sdf[c].dtype) for c in sdf.columns}
        odt = {c: str(odf[c].dtype) for c in odf.columns}
        drift = {c: (sdt[c], odt[c]) for c in sdt if sdt[c] != odt[c]}
        cs, co = canon_df(sdf), canon_df(odf)
        if cs != co:
            bad = [i for i, (a, b) in enumerate(zip(cs, co)) if a != b][:3]
            print(f"FAIL {name}: {len([1 for a,b in zip(cs,co) if a!=b])}/{len(cs)} rows differ; first at {bad}")
            if drift:
                print(f"  dtype drift: {drift}")
            for i in bad:
                print(f"  spark : {cs[i]}")
                print(f"  oracle: {co[i]}")
            n_fail += 1
            continue
        note = f" [dtype drift: {drift}]" if drift else ""
        print(f"PASS {name} ({len(sdf)} rows){note}")
        n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
