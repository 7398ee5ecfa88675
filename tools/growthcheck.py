#!/usr/bin/env python3
"""Economics twin of the correctness sweep: run graft.Bench at two scale
factors (default sf0.01 and sf0.1 — a 10x data span) and flag per-query
time ratios >= RATIO_BOUND (default 30), i.e. growth superlinear enough
that a 100 TB extrapolation is implausible. The three-SF correctness
sweep proves results are scale-stable; this proves the ECONOMICS are.

Queries below ABS_FLOOR seconds at the large SF are reported but never
flagged (fixed startup cost dominates them and their ratios are noise).

Usage: tools/growthcheck.py [small_sfdir] [big_sfdir] [query_filter]
Exit 1 if any flagged row.
"""
import json, os, subprocess, sys

SMALL = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
BIG = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
FILT = sys.argv[3] if len(sys.argv) > 3 else ""
RATIO_BOUND = float(os.environ.get("GRAFT_GROWTH_BOUND", "30"))
ABS_FLOOR = float(os.environ.get("GRAFT_GROWTH_FLOOR", "0.5"))

CP = "/opt/spark/jars/*:target/scala-2.13/classes"
ADD_OPENS = []
for p in ["java.base/java.lang", "java.base/java.lang.invoke", "java.base/java.lang.reflect",
          "java.base/java.io", "java.base/java.net", "java.base/java.nio", "java.base/java.util",
          "java.base/java.util.concurrent", "java.base/java.util.concurrent.atomic",
          "java.base/sun.nio.ch", "java.base/sun.nio.cs", "java.base/sun.security.action",
          "java.base/sun.util.calendar"]:
    ADD_OPENS += ["--add-opens", p + "=ALL-UNNAMED"]


def bench(sfdir):
    env = dict(os.environ)
    env["SPARK_GRAFT_SF_DIR"] = sfdir
    env.setdefault("SPARK_GRAFT_CPUS", "32")
    if FILT:
        env["GRAFT_QUERY_FILTER"] = FILT
    cmd = ["java"] + ADD_OPENS + [
        "-Xmx48g", "-Dspark.ui.enabled=false", "-Dspark.sql.session.timeZone=UTC",
        "-cp", CP, "graft.Bench"]
    print(f"[growthcheck] bench {sfdir} ...", flush=True)
    r = subprocess.run(cmd, env=env, capture_output=True, text=True)
    for line in r.stdout.splitlines():
        if line.startswith("{"):
            return json.loads(line)
    print(r.stdout[-2000:])
    print(r.stderr[-4000:])
    sys.exit(f"[growthcheck] no JSON line from bench at {sfdir}")


small = bench(SMALL)
big = bench(BIG)
# keep the raw per-query durations around for ledger/regression work —
# the comparison below is lossy (ratios only)
for tag, b in (("small", small), ("big", big)):
    with open(f"/tmp/graft_growthcheck_{tag}.json", "w") as f:
        json.dump(b, f)
for tag, b in (("small", small), ("big", big)):
    if b.get("failed"):
        sys.exit(f"[growthcheck] {tag} bench had failures: {b['failed']}")

rows = []
for name, tb in big["queries"].items():
    ts = small["queries"].get(name)
    if ts is None:
        continue
    ratio = tb / ts if ts > 0 else float("inf")
    flagged = ratio >= RATIO_BOUND and tb >= ABS_FLOOR
    rows.append((ratio, name, ts, tb, flagged))

rows.sort(reverse=True)
print(f"\n== growth ratios {BIG} vs {SMALL} "
      f"(bound {RATIO_BOUND}x, floor {ABS_FLOOR}s at big SF) ==")
print(f"{'query':<34} {'small_s':>9} {'big_s':>9} {'ratio':>7}")
for ratio, name, ts, tb, flagged in rows:
    mark = "  *** SUPERLINEAR ***" if flagged else ""
    print(f"{name:<34} {ts:>9.3f} {tb:>9.3f} {ratio:>7.2f}{mark}")

flags = [r for r in rows if r[4]]
print(f"\n{len(rows)} queries compared, {len(flags)} flagged")
sys.exit(1 if flags else 0)
