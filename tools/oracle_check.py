#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate.

Usage: oracle_check.py <sf_dir> <verify_out_dir>

Registers every parquet table in <sf_dir> as a DuckDB view, runs each
query from <verify_out_dir>/oracle_sql.json, and compares against the
engine's dump at <verify_out_dir>/<name>/ (spark parquet dir):
row count, column names (sorted), and a hash over the value matrix with
columns sorted by name and rows sorted by all columns.
"""
import sys, os, json, glob, math
import duckdb

def canon(df):
    # columns sorted by name, rows sorted by all values -> list of tuples
    cols = sorted(df.columns)
    df = df[cols]
    rows = df.values.tolist()
    def key(row):
        return tuple((str(type(v)), norm(v)) for v in row)
    rows.sort(key=key)
    return cols, rows

def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)  # full precision
    if isinstance(v, (bytes, bytearray)):
        # binary columns hex-encode so they sort/compare deterministically
        # (raw bytearray is unhashable and engine repr differs)
        return bytes(v).hex().upper()
    return str(v)

def main(sf_dir, out_dir):
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for p in glob.glob(os.path.join(sf_dir, "*.parquet")):
        name = os.path.basename(p)[: -len(".parquet")]
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    failures = 0
    for name, sql in sorted(oracle.items()):
        edir = os.path.join(out_dir, name)
        efiles = glob.glob(os.path.join(edir, "*.parquet"))
        if not efiles:
            print(f"[{name}] MISSING engine output"); failures += 1; continue
        try:
            odf = con.sql(sql).df()
        except Exception as e:
            print(f"[{name}] ORACLE SQL ERROR: {e}"); failures += 1; continue
        edf = con.sql(
            f"SELECT * FROM read_parquet({efiles!r})").df()
        ocols, orows = canon(odf)
        ecols, erows = canon(edf)
        ok = True
        if ocols != ecols:
            print(f"[{name}] SCHEMA mismatch: oracle={ocols} engine={ecols}"); ok = False
        if len(orows) != len(erows):
            print(f"[{name}] ROWS mismatch: oracle={len(orows)} engine={len(erows)}"); ok = False
        if ok:
            onorm = [tuple(norm(v) for v in r) for r in orows]
            enorm = [tuple(norm(v) for v in r) for r in erows]
            onorm.sort(); enorm.sort()
            if onorm != enorm:
                diffs = [(a, b) for a, b in zip(onorm, enorm) if a != b][:3]
                print(f"[{name}] HASH mismatch; first diffs: {diffs}")
                ok = False
        print(f"[{name}] {'OK' if ok else 'FAIL'} ({len(erows)} rows)")
        failures += 0 if ok else 1
    print(f"== {len(oracle) - failures}/{len(oracle)} queries match ==")
    return 1 if failures else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
