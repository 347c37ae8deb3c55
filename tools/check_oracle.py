#!/usr/bin/env python3
"""Local emulation of the driver's correctness gate: run each oracle SQL in
DuckDB over the testdata parquet, compare to the Verify parquet dump
(columns sorted by name, values hashed). Dev tool only - not product code.

Usage: python3 tools/check_oracle.py /root/testdata/sf0.01 /tmp/verify [--lint]

Lint warnings print for FAILING queries (the bare sum / raw list is the
most common root cause of a hash mismatch); pass --lint to see every
hit (a bare sum over DOUBLE does not widen and is a false positive).

Oracle-canon convention (lint enforced below; VERDICT r12 task 2):
 1. Every DuckDB aggregate that widens its result type must be cast
    back explicitly: sum(BIGINT) -> HUGEINT (int128) renders
    differently from Spark's LongType, so write CAST(sum(..) AS
    BIGINT) (or AS DOUBLE for fractional sums). count(*) is BIGINT
    already and needs no cast.
 2. Array-valued output columns must be serialized via to_json(...)
    in BOTH engines — the driver's pandas sort_values cannot hash a
    raw array column (see v_quantize_int8 r12 failure).
"""
import re, sys, json, glob, os
import duckdb
import pyarrow.parquet as pq


def lint_oracle(oracle):
    """Canon lint: bare widening sums and raw-list outputs in oracle SQL."""
    issues = []
    for name, sql in sorted(oracle.items()):
        # 1. a sum( not wrapped in a CAST( ... ) directly around it.
        for m in re.finditer(r"sum\s*\(", sql, re.IGNORECASE):
            prefix = sql[max(0, m.start() - 24):m.start()].lower()
            if not re.search(r"cast\s*\(\s*$", prefix):
                issues.append(f"{name}: bare sum( at char {m.start()} — "
                              "DuckDB widens to HUGEINT; wrap in CAST(.. AS BIGINT/DOUBLE)")
        # 2. list-producing funcs in the FINAL select without to_json.
        #    Heuristic: list_transform/list_value/LIST( aliased AS <col>
        #    at top level with no to_json( anywhere on that expression.
        for m in re.finditer(r"\b(list_transform|list_value|list_sort|list_distinct)\s*\(",
                             sql, re.IGNORECASE):
            tail = sql[m.end():m.end() + 400]
            head = sql[max(0, m.start() - 80):m.start()].lower()
            # inside a later-consumed CTE or wrapped in to_json/len/list_max etc. is fine
            if ("to_json" in head or re.search(
                    r"(len|list_max|list_min|list_dot_product|unnest|list_filter|"
                    r"list_contains|array_length|list_aggregate)\s*\(\s*$", head)):
                continue
            # only flag when this expression is aliased as an output column
            # in the final SELECT (no following FROM-in-CTE pattern is hard
            # to detect; keep it a warning, not a failure)
            if re.match(r"[^()]*\)\s+AS\s+\w+\s*(,|\s*FROM)", tail, re.IGNORECASE | re.DOTALL):
                issues.append(f"{name}: possible raw list output near char {m.start()} — "
                              "array outputs must be to_json(...)-serialized (warning)")
    return issues

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

def main(sf_dir, out_dir, lint_all=False):
    failed_names = set()
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
        if status == "FAIL":
            failed_names.add(name)
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
    lint = lint_oracle(oracle)
    shown = [w for w in lint
             if lint_all or w.split(":", 1)[0] in failed_names]
    if shown:
        print(f"-- oracle-canon lint: {len(shown)} warning(s)"
              f"{'' if lint_all else ' on failing queries (--lint for all)'} --")
        for w in shown:
            print("  " + w)
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2], "--lint" in sys.argv[3:]))
