#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet (written by graft.Verify), runs
the matching SQL from oracle_sql.json in DuckDB against views over
<sfDir>/*.parquet, and compares row-for-row / value-for-value (exact,
including float bit equality after a tiny tolerance report).

This mirrors the documented driver behavior: columns sorted by name, then
values hashed. We additionally print the first diff for debugging.
"""
import sys, json, glob, os
import duckdb
import pyarrow.parquet as pq

def canon(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    out = []
    for r in rows:
        out.append(tuple(norm(r[i]) for i in order))
    return [colnames[i] for i in order], out

def norm(v):
    # normalize timestamp-ish types to isoformat, Decimal to str,
    # NaN to a sentinel so NaN == NaN (the driver hashes values as
    # strings, where "nan" == "nan" — bit-compare would diverge from it)
    import datetime, decimal, math
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, decimal.Decimal):
        return str(v)
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else v
    if isinstance(v, list):
        return tuple(norm(x) for x in v)
    return v

def float_deltas(srows, drows):
    """Max absolute/relative delta over float positions of mismatching
    row pairs — the tolerance report printed on FAIL so a 1-ulp float
    drift is debuggable instead of a bare row dump."""
    max_abs = max_rel = 0.0
    n_float_diffs = 0
    for a, b in zip(srows, drows):
        if a == b:
            continue
        for x, y in zip(a, b):
            if isinstance(x, float) and isinstance(y, float) and x != y:
                d = abs(x - y)
                r = d / max(abs(x), abs(y)) if max(abs(x), abs(y)) > 0 else 0.0
                max_abs = max(max_abs, d)
                max_rel = max(max_rel, r)
                n_float_diffs += 1
    return n_float_diffs, max_abs, max_rel

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for p in glob.glob(os.path.join(sf_dir, "*.parquet")):
        t = os.path.basename(p)[:-len(".parquet")]
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_pass = n_fail = 0
    for name in sorted(os.listdir(out_dir)):
        d = os.path.join(out_dir, name)
        if not os.path.isdir(d):
            continue
        files = glob.glob(os.path.join(d, "*.parquet"))
        if not files:
            print(f"FAIL {name}: no parquet output"); n_fail += 1; continue
        spark_tbl = pq.read_table(files[0])
        spark_cols = spark_tbl.column_names
        spark_rows = [tuple(r.values()) for r in spark_tbl.to_pylist()]
        if name not in oracle:
            print(f"SKIP {name}: no oracle (rows={len(spark_rows)})")
            continue
        try:
            res = con.execute(oracle[name])
            duck_cols = [c[0] for c in res.description]
            duck_rows = res.fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}"); n_fail += 1; continue
        sc, srows = canon(spark_rows, spark_cols)
        dc, drows = canon(duck_rows, duck_cols)
        if sc != dc:
            print(f"FAIL {name}: columns differ spark={sc} duck={dc}"); n_fail += 1; continue
        if len(srows) != len(drows):
            print(f"FAIL {name}: rowcount spark={len(srows)} duck={len(drows)}"); n_fail += 1; continue
        bad = None
        for i, (a, b) in enumerate(zip(srows, drows)):
            if a != b:
                bad = (i, a, b); break
        if bad:
            i, a, b = bad
            nf, max_abs, max_rel = float_deltas(srows, drows)
            tol = (f" [float diffs: {nf}, max_abs={max_abs:.3e}, max_rel={max_rel:.3e}]"
                   if nf else "")
            print(f"FAIL {name}: row {i} differs{tol}\n  spark={a}\n  duck ={b}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(srows)} rows)")
            n_pass += 1
    print(f"\n{n_pass} pass / {n_fail} fail")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
