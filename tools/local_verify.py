#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate: run graft.Verify via sbt,
then run each oracle_sql.json query in DuckDB over the same parquet tables
and compare (rows, schema-ish, value hash with columns+rows sorted).

Usage: python3 tools/local_verify.py [sfDir] [outDir] [--skip-spark] [--only q1,q2]
"""
import sys, os, json, subprocess, glob
import duckdb

SF = sys.argv[1] if len(sys.argv) > 1 and not sys.argv[1].startswith('--') else "/root/testdata/sf0.01"
OUT = sys.argv[2] if len(sys.argv) > 2 and not sys.argv[2].startswith('--') else "/tmp/verify_out"
SKIP = "--skip-spark" in sys.argv
ONLY = None
for a in sys.argv:
    if a.startswith("--only"):
        ONLY = set(a.split("=", 1)[1].split(","))

if not SKIP:
    r = subprocess.run(
        ["sbt", "-batch", f'runMain graft.Verify {SF} {OUT}'],
        cwd="/root/repo", capture_output=True, text=True, timeout=1800)
    sys.stdout.write(r.stdout[-4000:])
    sys.stderr.write(r.stderr[-4000:])
    if r.returncode != 0:
        print("VERIFY RUN FAILED"); sys.exit(1)

con = duckdb.connect()
for p in glob.glob(f"{SF}/*.parquet"):
    name = os.path.basename(p)[:-8]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f"{OUT}/oracle_sql.json"))

def canon_rows(df):
    cols = sorted(df.columns)
    rows = []
    for rec in df[cols].itertuples(index=False):
        row = []
        for v in rec:
            if isinstance(v, float):
                row.append(f"{v:.9g}")
            else:
                row.append(str(v))
        rows.append("\x1f".join(row))
    rows.sort()
    return cols, rows

fails = 0
for name, sql in sorted(oracle.items()):
    if ONLY and name not in ONLY:
        continue
    pdir = f"{OUT}/{name}"
    try:
        got = con.sql(f"SELECT * FROM read_parquet('{pdir}/*.parquet')").df()
    except Exception as e:
        print(f"FAIL {name}: no spark output ({e})"); fails += 1; continue
    try:
        exp = con.sql(sql).df()
    except Exception as e:
        print(f"FAIL {name}: oracle SQL error: {e}"); fails += 1; continue
    gc, gr = canon_rows(got)
    ec, er = canon_rows(exp)
    if gc != ec:
        print(f"FAIL {name}: columns {gc} != {ec}"); fails += 1; continue
    if len(gr) != len(er):
        print(f"FAIL {name}: rows {len(gr)} != {len(er)}"); fails += 1
        for a, b in list(zip(gr, er))[:3]:
            if a != b: print("  got:", a[:200], "\n  exp:", b[:200])
        continue
    if gr != er:
        bad = [(a, b) for a, b in zip(gr, er) if a != b]
        print(f"FAIL {name}: {len(bad)} value mismatches of {len(gr)}")
        for a, b in bad[:3]:
            print("  got:", a[:200], "\n  exp:", b[:200])
        fails += 1
        continue
    print(f"PASS {name}: {len(gr)} rows")

print(f"\n{'ALL PASS' if fails == 0 else str(fails) + ' FAILURES'}")
sys.exit(1 if fails else 0)
