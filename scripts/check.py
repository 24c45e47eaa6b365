#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: for each query result
parquet under OUTDIR, run the corresponding oracle SQL from oracle_sql.json
in DuckDB against the testdata tables, and compare schema + values.

Usage: python3 scripts/check.py <sfDir> <outDir>
"""
import sys, json, glob, os
import duckdb

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for p in glob.glob(os.path.join(sf_dir, "*.parquet")):
        name = os.path.basename(p)[:-len(".parquet")]
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracles = json.load(f)
    results = {}
    # a query that CRASHED in Verify writes no result dir — it must fail
    # the gate, not silently vanish from it (r12 review: an empty outDir
    # used to print "== 0/0 pass ==" and exit green)
    result_dirs = {os.path.basename(d)
                   for d in glob.glob(os.path.join(out_dir, "*"))
                   if os.path.isdir(d)}
    for missing in sorted(set(oracles) - result_dirs):
        results[missing] = "MISSING: no result written (query crashed in Verify?)"
    for qdir in sorted(glob.glob(os.path.join(out_dir, "*"))):
        if not os.path.isdir(qdir):
            continue
        name = os.path.basename(qdir)
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet('{qdir}/*.parquet')").fetch_arrow_table()
        except Exception as e:
            results[name] = f"READ_FAIL: {e}"
            continue
        if name not in oracles:
            results[name] = f"NO_ORACLE rows={got.num_rows}" + (
                " (OK, rows>0)" if got.num_rows > 0 else " EMPTY!")
            continue
        try:
            exp = con.execute(oracles[name]).fetch_arrow_table()
        except Exception as e:
            results[name] = f"ORACLE_FAIL: {e}"
            continue
        # sort columns by name (mirrors driver), then compare
        got_s = got.select(sorted(got.column_names))
        exp_s = exp.select(sorted(exp.column_names))
        if got_s.column_names != exp_s.column_names:
            results[name] = f"COLS got={got_s.column_names} exp={exp_s.column_names}"
            continue
        if got_s.num_rows != exp_s.num_rows:
            results[name] = f"ROWS got={got_s.num_rows} exp={exp_s.num_rows}"
            continue
        schema_mismatch = [
            (f, str(got_s.schema.field(f).type), str(exp_s.schema.field(f).type))
            for f in got_s.column_names
            if got_s.schema.field(f).type != exp_s.schema.field(f).type]
        if schema_mismatch:
            # Strict: the driver's hash gate diverges on any physical-type
            # difference (round 1: decimal encodings) even when values match.
            results[name] = f"SCHEMA {schema_mismatch}"
            continue
        # vectorized fast-path (matters at sf1: q4 is 6M rows); fall back to
        # the python compare only to report the first differing row
        if got_s.combine_chunks().equals(exp_s.combine_chunks()):
            results[name] = "OK"
            continue
        # NaN-tolerant python compare (arrow equals() is NaN != NaN, so two
        # engines AGREEING on a NaN would otherwise red-fail — r12 review)
        def veq(a, b):
            if isinstance(a, float) and isinstance(b, float):
                return a == b or (a != a and b != b)
            if isinstance(a, list) and isinstance(b, list):
                return len(a) == len(b) and all(veq(x, y) for x, y in zip(a, b))
            if isinstance(a, dict) and isinstance(b, dict):
                return a.keys() == b.keys() and all(veq(a[k], b[k]) for k in a)
            return a == b
        gv, ev = got_s.to_pylist(), exp_s.to_pylist()
        bad = next((i for i, (a, b) in enumerate(zip(gv, ev))
                    if not veq(a, b)), None)
        if bad is not None:
            results[name] = f"VALUES first diff at row {bad}: got={gv[bad]} exp={ev[bad]}"
            continue
        results[name] = "OK"
    width = max(len(k) for k in results) if results else 0
    n_ok = sum(1 for v in results.values() if v.startswith(("OK", "NO_ORACLE rows")) and "EMPTY" not in v)
    for k in sorted(results):
        print(f"{k:<{width}}  {results[k]}")
    print(f"== {n_ok}/{len(results)} pass ==")
    sys.exit(0 if n_ok == len(results) else 1)

if __name__ == "__main__":
    main()
