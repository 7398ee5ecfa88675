#!/usr/bin/env python3
"""Local pre-flight for the driver's correctness gate: run graft.Verify,
then execute each oracle SQL in DuckDB over the same parquet tables and
compare results (columns sorted by name, rows sorted, exact values).

Usage: tools/localcheck.py [sfdir] [query_filter_substr]
"""
import json, math, subprocess, sys, tempfile, os, glob

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
FILT = sys.argv[2] if len(sys.argv) > 2 else ""
OUT = tempfile.mkdtemp(prefix="graft_verify_")

# GRAFT_CLASSES_DIR: alternate compiled-classes dir (e.g. a snapshot copy,
# so a long sweep is immune to a concurrent `sbt compile` swapping
# classfiles under the running JVMs — required for local-cluster runs
# where driver and executor JVMs load the dir independently).
CLASSES = os.environ.get("GRAFT_CLASSES_DIR", "target/scala-2.13/classes")
CP = "/opt/spark/jars/*:" + CLASSES
ADD_OPENS = []
for p in ["java.base/java.lang", "java.base/java.lang.invoke", "java.base/java.lang.reflect",
          "java.base/java.io", "java.base/java.net", "java.base/java.nio", "java.base/java.util",
          "java.base/java.util.concurrent", "java.base/java.util.concurrent.atomic",
          "java.base/sun.nio.ch", "java.base/sun.nio.cs", "java.base/sun.security.action",
          "java.base/sun.util.calendar"]:
    ADD_OPENS += ["--add-opens", p + "=ALL-UNNAMED"]

env = dict(os.environ)
env.setdefault("SPARK_GRAFT_CPUS", "8")
cmd = ["java"] + ADD_OPENS + [
    "-Xmx8g", "-Dspark.ui.enabled=false", "-Dspark.sql.session.timeZone=UTC",
    "-cp", CP, "graft.Verify", SF, OUT]
if FILT:
    env["GRAFT_QUERY_FILTER"] = FILT
print(f"[localcheck] running Verify -> {OUT}", flush=True)
r = subprocess.run(cmd, env=env, capture_output=True, text=True)
for line in r.stderr.splitlines():
    if "[verify]" in line or "Exception" in line:
        print(" ", line)
if r.returncode != 0:
    print(r.stdout[-3000:]); print(r.stderr[-5000:]); sys.exit(1)

import duckdb
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")

oracle = json.load(open(f"{OUT}/oracle_sql.json"))

def norm(v):
    if isinstance(v, float):
        if math.isnan(v): return "NaN"
        return repr(v)
    return str(v)

fails, passes, skips = [], [], []
filters = [f for f in FILT.split(",") if f] if FILT else []
names = sorted(set([os.path.basename(p) for p in glob.glob(f"{OUT}/*") if os.path.isdir(p)]))
for name in names:
    if filters and not any(f in name for f in filters): continue
    try:
        spark_rel = con.execute(f"SELECT * FROM '{OUT}/{name}/*.parquet'")
        scols = [d[0] for d in spark_rel.description]
        srows = spark_rel.fetchall()
    except Exception as e:
        fails.append((name, f"spark output unreadable: {e}")); continue
    if name not in oracle:
        skips.append((name, len(srows)))
        continue
    try:
        drel = con.execute(oracle[name])
        dcols = [d[0] for d in drel.description]
        drows = drel.fetchall()
        dtypes = [str(t) for t in con.sql(oracle[name]).types]
    except Exception as e:
        fails.append((name, f"oracle SQL error: {e}")); continue
    if sorted(scols) != sorted(dcols):
        fails.append((name, f"schema mismatch: spark={sorted(scols)} duck={sorted(dcols)}")); continue
    # The driver harness hashes values through a type-sensitive path:
    # DuckDB HUGEINT (what SUM(BIGINT) widens to) and wide DECIMALs
    # hash differently from Spark's long/double even when values are
    # numerically equal (seen: q_zorder_cluster r7 — local PASS, driver
    # FAIL). Fail loudly on any such output column so a local PASS
    # implies a driver PASS; fix is CAST(... AS BIGINT/DOUBLE) in the
    # oracle (and decimal-free output on the Spark side).
    stypes = [str(t) for t in con.sql(f"SELECT * FROM '{OUT}/{name}/*.parquet'").types]
    unsafe = [(c, t, "oracle") for c, t in zip(dcols, dtypes)
              if "HUGEINT" in t or t.startswith("DECIMAL")]
    unsafe += [(c, t, "spark") for c, t in zip(scols, stypes)
               if "HUGEINT" in t or t.startswith("DECIMAL")]
    if unsafe:
        fails.append((name, "driver-hash-unsafe output type(s): " +
                      ", ".join(f"{side}.{c}:{t}" for c, t, side in unsafe) +
                      " — cast to BIGINT/DOUBLE in final output")); continue
    sidx = [scols.index(c) for c in sorted(scols)]
    didx = [dcols.index(c) for c in sorted(dcols)]
    snorm = sorted([tuple(norm(r[i]) for i in sidx) for r in srows])
    dnorm = sorted([tuple(norm(r[i]) for i in didx) for r in drows])
    if len(snorm) != len(dnorm):
        fails.append((name, f"row count: spark={len(snorm)} duck={len(dnorm)}")); continue
    bad = None
    for i, (a, b) in enumerate(zip(snorm, dnorm)):
        if a != b:
            bad = (i, a, b); break
    if bad:
        fails.append((name, f"row {bad[0]} differs:\n    spark={bad[1]}\n    duck ={bad[2]}"))
    else:
        passes.append((name, len(snorm)))

print(f"\n== PASS ({len(passes)}) ==")
for n, c in passes: print(f"  {n} ({c} rows)")
print(f"== ROWS-ONLY ({len(skips)}) ==")
for n, c in skips: print(f"  {n} ({c} rows){' *** EMPTY ***' if c == 0 else ''}")
print(f"== FAIL ({len(fails)}) ==")
for n, m in fails: print(f"  {n}: {m}")
sys.exit(1 if fails else 0)
