#!/usr/bin/env python3
"""Local emulation of the driver's DuckDB-oracle compare.

Usage: python3 tools/crosscheck.py <sfDir> <verifyOutDir> [queryFilter] [--hash]

For each query dir under verifyOutDir: read our parquet result, run the
oracle SQL from oracle_sql.json in DuckDB over views of the raw tables,
sort columns by name, compare cell values exactly (with float tolerance
reporting so we can see WHERE it breaks, even though the driver hashes).

--hash additionally compares a normalized STRING hash of both results
(columns sorted by name, rows sorted by their canonical string tuple,
each cell rendered to a canonical string). This is strictly harsher than
the cell compare: python Decimal('1.50') == Decimal('1.5') and
Timestamp-with-tz == naive-Timestamp can pass cell-equality while a
driver that hashes rendered values diverges. r6 lost its only red row
(p71) to exactly this class — a double→DECIMAL(18,2) cast whose rendered
scale differed between engines. Any query whose cells match but whose
canonical hash differs is reported HASHDIFF with the first differing
rendered pair, plus a RISK line for every query emitting float / decimal
/ timestamp columns so contract authors can pick integer-exact shapes.
"""
import sys, json, glob, math, hashlib, datetime
from decimal import Decimal
import duckdb
import pyarrow.parquet as pq

TABLES = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]

def canon(v):
    """Canonical string rendering of one cell, emulating the class of
    normalizations a hashing driver applies. Deliberately NOT lossy:
    distinct renderings that a driver could plausibly hash apart map to
    distinct strings (decimal keeps its scale, floats use repr)."""
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == 0.0:  # normalize -0.0
            return "0.0"
        return repr(v)
    if isinstance(v, Decimal):
        return str(v)  # keeps scale: '1.50' stays '1.50'
    if isinstance(v, datetime.datetime):
        # tz-aware → UTC instant; naive stays wall-clock
        if v.tzinfo is not None:
            v = v.astimezone(datetime.timezone.utc).replace(tzinfo=None)
        return v.isoformat(sep=" ", timespec="microseconds")
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, bytes):
        return "0x" + v.hex()
    if isinstance(v, list):
        return "[" + ",".join(canon(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{canon(x)}" for k, x in sorted(v.items())) + "}"
    return str(v)

RISKY = ("float", "double", "decimal", "timestamp", "halffloat")

def risky_cols(table):
    out = []
    for f in table.schema:
        t = str(f.type)
        if any(r in t for r in RISKY):
            out.append(f"{f.name}:{t}")
    return out

def hash_rows(rows, cols):
    rendered = sorted(tuple(canon(r[c]) for c in cols) for r in rows)
    h = hashlib.sha256()
    for row in rendered:
        h.update("\x1f".join(row).encode()); h.update(b"\x1e")
    return h.hexdigest(), rendered

def main(argv):
    # parse once: flags anywhere, positionals = <sfDir> <outDir> [filter]
    do_hash = "--hash" in argv
    pos = [a for a in argv[1:] if not a.startswith("--")]
    if len(pos) < 2:
        print(__doc__); return 2
    sf_dir, out_dir = pos[0], pos[1]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    if len(pos) > 2:
        keep = set(pos[2].split(","))
        oracles = {k: v for k, v in oracles.items() if k in keep}
    n_pass = n_fail = n_hashdiff = 0
    risks = []
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
            continue
        # schema check (types as pyarrow sees them)
        ot = [str(ours.schema.field(c).type) for c in oc]
        tt = [str(theirs.schema.field(c).type) for c in tc]
        note = "" if ot == tt else f"  [type diff: {list(zip(oc, ot, tt))}]"
        if do_hash:
            oh, orows = hash_rows(od, oc)
            th, trows = hash_rows(td, tc)
            rc = sorted(set(risky_cols(ours)) | set(risky_cols(theirs)))
            if rc:
                risks.append((name, rc))
            if oh != th:
                first = next((a, b) for a, b in zip(orows, trows) if a != b)
                print(f"HASHDIFF {name}: cells equal but canonical render "
                      f"differs: ours={first[0]} oracle={first[1]}")
                n_hashdiff += 1
                continue
            note += "  [hash ok]"
        print(f"PASS {name} ({ours.num_rows} rows){note}")
        n_pass += 1
    if do_hash and risks:
        print("\nRISK (non-integer output contracts — verify the rendering "
              "is engine-stable, prefer integer-exact shapes):")
        for name, rc in risks:
            print(f"  {name}: {', '.join(rc)}")
    print(f"\n{n_pass} pass, {n_fail} fail" +
          (f", {n_hashdiff} hashdiff" if do_hash else ""))
    return 1 if (n_fail or n_hashdiff) else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv))
