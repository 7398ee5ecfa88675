#!/usr/bin/env python3
"""Round-over-round plan-digest diff: compare two PLANS_r{N}.json
artifacts (tools/plandigest.py output) and flag structural regressions —
the deterministic replacement for wall-clock comparisons on this noisy
shared VM.

Flags, per query present in BOTH artifacts:
  - exchange count grew by more than --pct (default 20%) AND by more
    than --abs (default 1 — a 1->2 exchange move is planner jitter, not
    a regression; 5->7 is);
  - gained any CartesianProduct;
  - gained any BroadcastNestedLoopJoin.

Also reports (informationally, never flagged): removed queries, added
queries, and the largest exchange DECREASES (improvements worth noting
in BENCH_NOTES).

Usage: tools/plandiff.py OLD.json NEW.json [--pct 20] [--abs 1] [--md]
Exit 1 iff any query is flagged.
"""
import argparse, json, sys

ap = argparse.ArgumentParser()
ap.add_argument("old")
ap.add_argument("new")
ap.add_argument("--pct", type=float, default=20.0,
                help="flag exchange growth above this percent")
ap.add_argument("--abs", dest="abs_", type=int, default=1,
                help="AND above this absolute exchange delta")
ap.add_argument("--md", action="store_true",
                help="emit a markdown table instead of plain lines")
args = ap.parse_args()

old = json.load(open(args.old))["queries"]
new = json.load(open(args.new))["queries"]

flagged, improved, rows = [], [], []
for q in sorted(set(old) & set(new)):
    o, n = old[q], new[q]
    eo, en = o["exchanges"], n["exchanges"]
    reasons = []
    if en > eo and (en - eo) > args.abs_ and (en - eo) * 100.0 > args.pct * max(eo, 1):
        reasons.append(f"exchanges {eo}->{en}")
    if n["cartesian"] > o["cartesian"]:
        reasons.append(f"cartesian {o['cartesian']}->{n['cartesian']}")
    if n["bnlj"] > o["bnlj"]:
        reasons.append(f"bnlj {o['bnlj']}->{n['bnlj']}")
    if reasons:
        flagged.append((q, reasons))
        rows.append((q, eo, en, "FLAG: " + "; ".join(reasons)))
    elif en < eo:
        improved.append((q, eo, en))

added = sorted(set(new) - set(old))
removed = sorted(set(old) - set(new))

if args.md:
    print(f"| metric | value |\n|---|---|")
    print(f"| queries compared | {len(set(old) & set(new))} |")
    print(f"| flagged | {len(flagged)} |")
    print(f"| added | {len(added)} |")
    print(f"| removed | {len(removed)} |")
    if rows:
        print("\n| query | exch old | exch new | reason |\n|---|---|---|---|")
        for q, eo, en, r in rows:
            print(f"| {q} | {eo} | {en} | {r} |")
    if improved:
        print("\n| query | exch old | exch new | (improved) |\n|---|---|---|---|")
        for q, eo, en in sorted(improved, key=lambda t: t[1] - t[2], reverse=True)[:10]:
            print(f"| {q} | {eo} | {en} | -{eo - en} |")
else:
    print(f"[plandiff] compared={len(set(old) & set(new))} "
          f"flagged={len(flagged)} added={len(added)} removed={len(removed)}")
    for q, reasons in flagged:
        print(f"[plandiff] FLAG {q}: {'; '.join(reasons)}")
    for q, eo, en in sorted(improved, key=lambda t: t[1] - t[2], reverse=True)[:10]:
        print(f"[plandiff] improved {q}: exchanges {eo}->{en}")
    if added:
        print(f"[plandiff] added: {', '.join(added)}")
    if removed:
        print(f"[plandiff] removed: {', '.join(removed)}")

sys.exit(1 if flagged else 0)
