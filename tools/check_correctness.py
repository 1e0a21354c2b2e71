#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate: run graft.Verify at a given
sf, then compare each query's parquet output against its DuckDB oracle
(columns sorted by name, rows sorted, values compared). Usage:
  python3 tools/check_correctness.py [sfdir] [outdir] [--skip-verify]
"""
import sys, os, json, subprocess, glob
import duckdb

sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
outdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

if "--skip-verify" not in sys.argv:
    r = subprocess.run(
        ["sbt", "-batch", f'runMain graft.Verify {sfdir} {outdir}'],
        cwd="/root/repo", capture_output=True, text=True)
    sys.stdout.write(r.stdout[-3000:])
    if r.returncode != 0:
        sys.stderr.write(r.stderr[-3000:])
        sys.exit(1)

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
con = duckdb.connect()
for p in glob.glob(f"{sfdir}/*.parquet"):
    name = os.path.basename(p)[:-8]
    con.sql(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")

results = {}
for qdir in sorted(glob.glob(f"{outdir}/*/")):
    name = os.path.basename(qdir.rstrip("/"))
    got = con.sql(f"SELECT * FROM '{qdir}/*.parquet'").df()
    row = {"rows": len(got)}
    if name in oracle:
        try:
            exp = con.sql(oracle[name]).df()
            got2 = got[sorted(got.columns)].sort_values(by=sorted(got.columns)).reset_index(drop=True)
            exp2 = exp[sorted(exp.columns)].sort_values(by=sorted(exp.columns)).reset_index(drop=True)
            row["schema_match"] = list(got2.columns) == list(exp2.columns) and \
                [str(t) for t in got2.dtypes] == [str(t) for t in exp2.dtypes]
            row["rows_match"] = len(got2) == len(exp2)
            row["hash_match"] = row["rows_match"] and got2.equals(exp2)
            if not row["hash_match"] and row["rows_match"]:
                diff = (got2 != exp2) & ~(got2.isna() & exp2.isna())
                badcols = [c for c in got2.columns if diff[c].any()]
                row["diff_cols"] = badcols[:5]
            if not row["schema_match"]:
                row["got_schema"] = {c: str(t) for c, t in zip(got.columns, got.dtypes)}
                row["exp_schema"] = {c: str(t) for c, t in zip(exp.columns, exp.dtypes)}
            if not row["rows_match"]:
                row["exp_rows"] = len(exp2)
        except Exception as e:
            row["oracle_error"] = str(e)[:300]
    else:
        row["oracle"] = "absent (rows-only check)"
    results[name] = row

# an oracle that fails to RUN is a failure, not a rows-only pass — a
# generated-SQL bug must not report as green
ok = all(
    "oracle_error" not in r and r.get("hash_match", r["rows"] > 0)
    for r in results.values())
print(json.dumps(results, indent=2, default=str))
print("ALL GREEN" if ok else "FAILURES PRESENT")
sys.exit(0 if ok else 2)
