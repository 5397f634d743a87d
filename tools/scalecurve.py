#!/usr/bin/env python3
"""Tri-SF scale-curve table: per-family scaling exponents from three
Bench runs (the r11/r12 verdicts' top carried ask).

Usage: python3 tools/scalecurve.py <bench_sf0.001.json> <bench_sf0.01.json> <bench_sf0.1.json>

For each query family (name prefix before the first '_'), sums the
per-query medians at each SF and reports the fitted exponent
e = log(t_hi / t_lo) / log(100) over the 100x sf0.001 -> sf0.1 span,
plus the 10x legs. e <= 1 is at-most-linear in data volume; because
every query carries a fixed ~0.1-0.3 s scheduling floor, measured
exponents UNDERSTATE data scaling — a truly quadratic kernel would
still stand out (e >= ~1.5 once the floor is dominated).

Prints a markdown table ready for SCALE.md.
"""
import json, math, sys, collections

# Ambient-load guard (r13 verdict "What's missing #3"): the 32-cpu host
# idles around loadavg 2; bench totals at one HEAD have swung 207->343 s
# purely from co-tenant load. A scale-curve table fitted on a loaded run
# is noise, so refuse any input whose recorded 1-min load ever exceeded
# this bound during the run (override with --force for diagnostics).
LOAD_BOUND = 8.0

def check_load(path, force):
    b = json.load(open(path))
    seen = []
    for key in ("load_start", "load_end"):
        if key in b:
            seen.append(b[key][0])
    for pair in b.get("load", {}).values():
        seen.extend(pair)
    peak = max([x for x in seen if x >= 0], default=None)
    if peak is not None and peak > LOAD_BOUND:
        msg = (f"REFUSING {path}: peak 1-min loadavg {peak:.1f} > "
               f"{LOAD_BOUND} during the bench run - re-run on an idle host")
        if force:
            print("WARNING (--force) " + msg, file=sys.stderr)
        else:
            print(msg, file=sys.stderr)
            sys.exit(2)

def fam_totals(path):
    b = json.load(open(path))
    fam = collections.Counter()
    n = collections.Counter()
    for k, v in b["queries"].items():
        if v is not None:
            fam[k.split("_")[0]] += v
            n[k.split("_")[0]] += 1
    return fam, n, b.get("failed", [])

def main():
    force = "--force" in sys.argv
    args = [a for a in sys.argv[1:] if a != "--force"]
    lo, mid, hi = args[0], args[1], args[2]
    for p in (lo, mid, hi):
        check_load(p, force)
    flo, nlo, xlo = fam_totals(lo)
    fmid, _, xmid = fam_totals(mid)
    fhi, nhi, xhi = fam_totals(hi)
    for tag, xs in (("sf0.001", xlo), ("sf0.01", xmid), ("sf0.1", xhi)):
        if xs:
            print(f"WARNING {tag} failed queries: {xs}", file=sys.stderr)
    fams = sorted(set(flo) | set(fmid) | set(fhi),
                  key=lambda f: -fhi.get(f, 0.0))
    print("| family (queries) | t sf0.001 | t sf0.01 | t sf0.1 | "
          "exp 0.001→0.01 | exp 0.01→0.1 | exp 0.001→0.1 (100x) |")
    print("|---|---|---|---|---|---|---|")
    total = [0.0, 0.0, 0.0]
    for f in fams:
        a, b_, c = flo.get(f, 0.0), fmid.get(f, 0.0), fhi.get(f, 0.0)
        total[0] += a; total[1] += b_; total[2] += c
        def e(x, y):
            return (f"{math.log(y / x) / math.log(10):.2f}"
                    if x > 0 and y > 0 else "—")
        e100 = (f"{math.log(c / a) / math.log(100):.2f}"
                if a > 0 and c > 0 else "—")
        print(f"| {f} ({nhi.get(f, nlo.get(f, 0))}) | {a:.1f} s | "
              f"{b_:.1f} s | {c:.1f} s | {e(a, b_)} | {e(b_, c)} | {e100} |")
    a, b_, c = total
    print(f"| **all** | {a:.1f} s | {b_:.1f} s | {c:.1f} s | "
          f"{math.log(b_ / a) / math.log(10):.2f} | "
          f"{math.log(c / b_) / math.log(10):.2f} | "
          f"{math.log(c / a) / math.log(100):.2f} |")

main()
