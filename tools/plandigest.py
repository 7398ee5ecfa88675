#!/usr/bin/env python3
"""Plan-shape artifact: run graft.tools.PlanDigest over the registry and
write PLANS_r{N}.json — per query, the physical-plan operator multiset
plus exchange/cartesian/nested-loop counters. Timings on this VM carry a
1.7x noise band; plans are deterministic, so the round-over-round diff
of THIS artifact is the honest structural-regression signal (PlanAudit
cross-checks it against its pinned ceilings).

Usage: tools/plandigest.py [sfdir] [outpath] [query_filter]
"""
import os, subprocess, sys

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
OUT = sys.argv[2] if len(sys.argv) > 2 else "PLANS_r15.json"
FILT = sys.argv[3] if len(sys.argv) > 3 else ""

CP = "/opt/spark/jars/*:target/scala-2.13/classes"
ADD_OPENS = []
for p in ["java.base/java.lang", "java.base/java.lang.invoke", "java.base/java.lang.reflect",
          "java.base/java.io", "java.base/java.net", "java.base/java.nio", "java.base/java.util",
          "java.base/java.util.concurrent", "java.base/java.util.concurrent.atomic",
          "java.base/sun.nio.ch", "java.base/sun.nio.cs", "java.base/sun.security.action",
          "java.base/sun.util.calendar"]:
    ADD_OPENS += ["--add-opens", p + "=ALL-UNNAMED"]

env = dict(os.environ)
if FILT:
    env["GRAFT_QUERY_FILTER"] = FILT
cmd = ["java"] + ADD_OPENS + ["-Xmx8g", "-cp", CP, "graft.tools.PlanDigest", SF, OUT]
sys.exit(subprocess.call(cmd, env=env))
