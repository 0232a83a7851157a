#!/usr/bin/env python3
"""Local emulation of the driver's correctness gate.

Usage: oracle_check.py <sfDir> <verifyOutDir>

Registers each testdata parquet as a DuckDB view, runs every oracle SQL from
<verifyOutDir>/oracle_sql.json, loads the corresponding Spark result parquet,
sorts columns by name and rows by all columns, and compares values.
"""
import sys, json, glob, math
import duckdb

TABLES = ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]

def norm_cell(v):
    # BIT-EXACT float compare (repr = shortest round-trip, unique per
    # double). The driver's hash is exact; a looser grain here shipped two
    # false-green ops in round 4 (text-corpus-stats / text-repetition).
    if isinstance(v, float):
        if math.isnan(v): return "NaN"
        return repr(v)
    return str(v)

def norm(df):
    cols = sorted(df.columns)
    df = df[cols]
    rows = [tuple(norm_cell(v) for v in r) for r in df.itertuples(index=False)]
    rows.sort()
    return cols, rows

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            exp = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1; continue
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark result parquet")
            n_fail += 1; continue
        got = con.execute(f"SELECT * FROM read_parquet({files!r})").df()
        ec, er = norm(exp); gc, gr = norm(got)
        if [c.lower() for c in ec] != [c.lower() for c in gc]:
            print(f"FAIL {name}: columns differ: oracle={ec} spark={gc}")
            n_fail += 1; continue
        if er != gr:
            print(f"FAIL {name}: {len(er)} oracle rows vs {len(gr)} spark rows; first diff:")
            for a, b in zip(er, gr):
                if a != b:
                    print(f"  oracle: {a}\n  spark : {b}"); break
            else:
                k = min(len(er), len(gr))
                print(f"  extra rows from index {k}: "
                      f"{(er[k:k+2] if len(er)>k else gr[k:k+2])}")
            n_fail += 1; continue
        print(f"OK   {name} ({len(gr)} rows)")
        n_ok += 1
    print(f"== {n_ok} ok, {n_fail} fail")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
