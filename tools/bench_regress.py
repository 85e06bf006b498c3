#!/usr/bin/env python3
"""Per-query regression check between two Bench JSON artifacts.

BASELINE.md's rule: any query slower than its recorded median by >3x
across two consecutive rounds (outside documented host-noise windows)
is a plan regression. This prints every key's old/new/ratio, flags
>3x, and lists keys present on only one side.

Usage: python3 tools/bench_regress.py OLD.json NEW.json [threshold]
"""
import json, sys

old = json.load(open(sys.argv[1]))["queries"]
new = json.load(open(sys.argv[2]))["queries"]
thr = float(sys.argv[3]) if len(sys.argv) > 3 else 3.0

flagged = []
for k in sorted(set(old) & set(new)):
    o, n = old[k], new[k]
    if o <= 0 or n <= 0:
        continue
    r = n / o
    mark = " <-- REGRESSION" if r > thr else ""
    if r > thr:
        flagged.append(k)
    print(f"{k:28s} old={o:8.2f}s new={n:8.2f}s ratio={r:5.2f}{mark}")
only_old = sorted(set(old) - set(new))
only_new = sorted(set(new) - set(old))
if only_old:
    print("only in old:", ", ".join(only_old))
if only_new:
    print("only in new:", ", ".join(only_new))
print(f"\n{'FAIL' if flagged else 'PASS'}: {len(flagged)} key(s) over {thr}x"
      + (": " + ", ".join(flagged) if flagged else ""))
sys.exit(1 if flagged else 0)
