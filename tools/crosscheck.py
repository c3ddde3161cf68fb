#!/usr/bin/env python3
"""Local emulation of the driver's DuckDB-oracle compare.

Usage: python3 tools/crosscheck.py <sfDir> <verifyOutDir>

For each query dir under verifyOutDir: read our parquet result, run the
oracle SQL from oracle_sql.json in DuckDB over views of the raw tables,
sort columns by name, compare cell values exactly (with float tolerance
reporting so we can see WHERE it breaks, even though the driver hashes).
"""
import sys, json, glob, math
import duckdb
import pyarrow.parquet as pq

TABLES = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]

def norm(v):
    if isinstance(v, float):
        return v
    return v

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    if len(sys.argv) > 3:
        keep = set(sys.argv[3].split(","))
        oracles = {k: v for k, v in oracles.items() if k in keep}
    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no result parquet"); n_fail += 1; continue
        ours = pq.read_table(files[0])
        try:
            theirs = con.execute(sql).arrow()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}"); n_fail += 1; continue
        oc = sorted(ours.column_names); tc = sorted(theirs.column_names)
        if oc != tc:
            print(f"FAIL {name}: columns {oc} vs {tc}"); n_fail += 1; continue
        ours = ours.select(oc); theirs = theirs.select(tc)
        if ours.num_rows != theirs.num_rows:
            print(f"FAIL {name}: rows {ours.num_rows} vs {theirs.num_rows}"); n_fail += 1; continue
        od = ours.to_pylist(); td = theirs.to_pylist()
        bad = None
        for i, (a, b) in enumerate(zip(od, td)):
            for c in oc:
                x, y = a[c], b[c]
                if x is None and y is None: continue
                if isinstance(x, float) and isinstance(y, float):
                    if x != y and not (math.isnan(x) and math.isnan(y)):
                        bad = (i, c, x, y); break
                elif x != y:
                    bad = (i, c, x, y); break
            if bad: break
        if bad:
            i, c, x, y = bad
            print(f"FAIL {name}: row {i} col {c}: ours={x!r} oracle={y!r}")
            n_fail += 1
        else:
            # schema check (types as pyarrow sees them)
            ot = [str(ours.schema.field(c).type) for c in oc]
            tt = [str(theirs.schema.field(c).type) for c in tc]
            note = "" if ot == tt else f"  [type diff: {list(zip(oc, ot, tt))}]"
            print(f"PASS {name} ({ours.num_rows} rows){note}")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
