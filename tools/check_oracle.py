#!/usr/bin/env python3
"""Local emulation of the driver's correctness gate: run each oracle SQL in
DuckDB over the testdata parquet, compare to the Verify parquet dump
(columns sorted by name, values hashed). Dev tool only - not product code.

Usage: python3 tools/check_oracle.py /root/testdata/sf0.01 /tmp/verify

Oracle-canon convention (VERDICT r12 task 2, r20 hardening):
 1. Every DuckDB aggregate that widens its result type must be cast
    back explicitly: sum(BIGINT) -> HUGEINT (arrow decimal128(38,0))
    hashes differently from Spark's LongType at the driver even when
    every value is equal, so write CAST(sum(..) AS BIGINT) (or AS
    DOUBLE for fractional sums). count(*) is BIGINT already.
 2. Array-valued output columns must be serialized via to_json(...)
    in BOTH engines - the driver's pandas sort_values cannot hash a
    raw array column (see v_quantize_int8 r12 failure).

r20 hardening (VERDICT r20 #2 - the s41 red row shipped because this
tool was laxer than the driver):
 (a) the value compare is TYPE-FAITHFUL: each column carries an arrow
     type family tag, so Decimal('899') vs int64 899 FAILS here like
     it does at the driver (the old canon() stringified them equal);
 (b) the lint resolves each oracle's RESULT SCHEMA through DuckDB
     instead of regexing the SQL (kills the 14 standing bare-sum
     false positives on DOUBLE columns), runs over ALL queries, and
     any hit FAILS the tool (exit 1) - it cannot be shipped around.
"""
import sys, json, glob, os
import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

TABLES = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]


def type_tag(t):
    """Arrow type -> the family the driver's hash distinguishes.

    Widths collapse (int32 vs int64 render identically through the
    driver's pandas path) but families do not: decimal vs int is
    exactly the s41 failure mode this tool previously missed.
    """
    if pa.types.is_decimal(t):
        return f"decimal({t.precision},{t.scale})"
    if pa.types.is_integer(t):
        return "int"
    if pa.types.is_floating(t):
        return "float"
    if pa.types.is_boolean(t):
        return "bool"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "str"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return "bytes"
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return f"list<{type_tag(t.value_type)}>"
    if pa.types.is_timestamp(t):
        return "ts"
    if pa.types.is_date(t):
        return "date"
    return str(t)


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
    types = [type_tag(tbl.schema.field(c).type) for c in cols]
    rows = [tuple(canon(v) for v in row)
            for row in zip(*[tbl[c].to_pylist() for c in cols])]
    return cols, types, rows


def lint_schema(name, schema):
    """Canon violations visible in the RESULT schema (no regexes).

    decimal(38,0) is DuckDB's HUGEINT rendering - only a bare integer
    sum produces it (convention #1). A list-typed output column is a
    raw array the driver cannot hash (convention #2).
    """
    issues = []
    for field in schema:
        tag = type_tag(field.type)
        if tag == "decimal(38,0)":
            issues.append(
                f"{name}: column `{field.name}` is HUGEINT "
                "(decimal128(38,0)) - bare integer sum; wrap in "
                "CAST(sum(..) AS BIGINT)")
        elif tag.startswith("list<"):
            issues.append(
                f"{name}: column `{field.name}` is a raw {tag} - array "
                "outputs must be to_json(...)-serialized in both engines")
    return issues


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    lint = []
    seen = set()
    for name in sorted(os.listdir(out_dir)):
        d = os.path.join(out_dir, name)
        if not os.path.isdir(d):
            continue
        seen.add(name)
        files = glob.glob(f"{d}/*.parquet")
        got = pq.read_table(files[0]) if files else None
        if name not in oracle:
            rows = got.num_rows if got is not None else -1
            print(f"{name:28s} rows-only n={rows} {'PASS' if rows > 0 else 'FAIL'}")
            n_pass += rows > 0; n_fail += rows <= 0
            continue
        exp = con.execute(oracle[name]).arrow()
        lint += lint_schema(name, exp.schema)
        gc, gt, gr = table_rows(got)
        ec, et, er = table_rows(exp)
        ok_schema = gc == ec
        ok_types = gt == et
        ok_rows = len(gr) == len(er)
        ok_hash = gr == er and ok_types
        status = "PASS" if (ok_schema and ok_rows and ok_hash) else "FAIL"
        n_pass += status == "PASS"; n_fail += status == "FAIL"
        print(f"{name:28s} {status} rows={len(gr)}/{len(er)} schema={ok_schema}", end="")
        if not ok_schema:
            print(f" got={gc} exp={ec}", end="")
        if ok_schema and not ok_types:
            diffs = [f"{c}: got {a} exp {b}"
                     for c, a, b in zip(gc, gt, et) if a != b]
            print(f" type_mismatch[{'; '.join(diffs)}]", end="")
        if ok_schema and ok_rows and ok_types and not ok_hash:
            for i, (a, b) in enumerate(zip(gr, er)):
                if a != b:
                    print(f" first_diff@{i}: got={a} exp={b}", end="")
                    break
        print()
    # lint every oracle, including any with no dump present this run
    for name in sorted(set(oracle) - seen):
        try:
            schema = con.execute(oracle[name]).arrow().schema
            lint += lint_schema(name, schema)
        except Exception as e:
            lint.append(f"{name}: oracle SQL failed to execute: {e}")
    print(f"== {n_pass} pass / {n_fail} fail ==")
    if lint:
        print(f"-- oracle-canon lint: {len(lint)} violation(s) (tool FAILS on any) --")
        for w in lint:
            print("  " + w)
    return 1 if (n_fail or lint) else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
