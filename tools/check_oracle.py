#!/usr/bin/env python3
"""Local emulation of the driver's correctness gate: run each oracle SQL in
DuckDB over the testdata parquet, compare to the Verify parquet dump
(columns sorted by name, values hashed). Dev tool only - not product code.

Usage: python3 tools/check_oracle.py /root/testdata/sf0.01 /tmp/verify
"""
import sys, json, glob, os
import duckdb
import pyarrow.parquet as pq

TABLES = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]

def canon(val):
    if isinstance(val, float):
        # mirror a tolerant float compare: round to 9 significant-ish digits
        return f"{val:.9g}"
    if isinstance(val, bytes):
        return val.hex()
    if isinstance(val, list):
        return "[" + ",".join(canon(v) for v in val) + "]"
    return str(val)

def table_rows(tbl):
    cols = sorted(tbl.column_names)
    tbl = tbl.select(cols)
    return cols, [tuple(canon(v) for v in row) for row in zip(*[tbl[c].to_pylist() for c in cols])]

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(os.listdir(out_dir)):
        d = os.path.join(out_dir, name)
        if not os.path.isdir(d):
            continue
        files = glob.glob(f"{d}/*.parquet")
        got = pq.read_table(files[0]) if files else None
        if name not in oracle:
            rows = got.num_rows if got is not None else -1
            print(f"{name:28s} rows-only n={rows} {'PASS' if rows > 0 else 'FAIL'}")
            n_pass += rows > 0; n_fail += rows <= 0
            continue
        exp = con.execute(oracle[name]).arrow()
        gc, gr = table_rows(got)
        ec, er = table_rows(exp)
        ok_schema = gc == ec
        ok_rows = len(gr) == len(er)
        ok_hash = gr == er
        status = "PASS" if (ok_schema and ok_rows and ok_hash) else "FAIL"
        n_pass += status == "PASS"; n_fail += status == "FAIL"
        print(f"{name:28s} {status} rows={len(gr)}/{len(er)} schema={ok_schema}", end="")
        if not ok_schema:
            print(f" got={gc} exp={ec}", end="")
        if ok_schema and ok_rows and not ok_hash:
            for i, (a, b) in enumerate(zip(gr, er)):
                if a != b:
                    print(f" first_diff@{i}: got={a} exp={b}", end="")
                    break
        print()
    print(f"== {n_pass} pass / {n_fail} fail ==")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
