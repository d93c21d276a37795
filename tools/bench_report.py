#!/usr/bin/env python3
"""Calibration-normalized bench comparison.

Usage:
    python3 tools/bench_report.py CURRENT.json [PREVIOUS.json]

CURRENT/PREVIOUS are either a BENCH_FULL.json (per-query dispersion
[lo, med, hi] + calibration) or a driver BENCH_r{N}.json (whose
`parsed` field holds the same shape minus dispersion).

The calibration pair is a data-free range-aggregate run at the start
and end of the bench; its median approximates "how fast was this
machine today". Dividing every query median by it turns wall-clock
seconds into machine-relative units, so a cross-round delta reads as
a real plan change rather than noise from a colder/warmer container.
A delta is flagged significant only when the previous normalized time
also falls outside the current run's normalized dispersion band.
"""
import json
import sys


def load(path):
    with open(path) as f:
        d = json.load(f)
    if "parsed" in d:
        d = d["parsed"]
    cal = d.get("calibration") or {}
    cal_med = None
    if "start" in cal and "end" in cal:
        cal_med = (cal["start"] + cal["end"]) / 2.0
    return {
        "path": path,
        "sf": d.get("sf"),
        "total": d.get("value"),
        "queries": d.get("queries", {}),
        "dispersion": d.get("dispersion", {}),
        "calibration": cal,
        "cal_med": cal_med,
    }


def main():
    if len(sys.argv) < 2:
        print(__doc__)
        sys.exit(2)
    cur = load(sys.argv[1])
    prev = load(sys.argv[2]) if len(sys.argv) > 2 else None

    if cur["cal_med"] is None:
        print(f"WARN: {cur['path']} has no calibration pair; "
              "normalizing by 1.0 (raw seconds)")
        cur["cal_med"] = 1.0
    print(f"current : {cur['path']}  sf={cur['sf']}  total={cur['total']}s  "
          f"calibration={cur['calibration']} -> unit={cur['cal_med']:.3f}s")
    if prev:
        if prev["cal_med"] is None:
            print(f"WARN: {prev['path']} has no calibration pair; "
                  "normalizing by 1.0 (raw seconds)")
            prev["cal_med"] = 1.0
        print(f"previous: {prev['path']}  sf={prev['sf']}  "
              f"total={prev['total']}s  "
              f"calibration={prev['calibration']} -> unit={prev['cal_med']:.3f}s")
        if prev["sf"] != cur["sf"]:
            print(f"WARN: scale factors differ ({prev['sf']} vs {cur['sf']}) "
                  "— deltas are not comparable")
        drift = cur["cal_med"] / prev["cal_med"]
        print(f"machine drift (cur unit / prev unit): {drift:.3f}x "
              "(normalization removes this from the deltas below)")
    print()

    hdr = (f"{'query':<28}{'cur s':>9}{'cur norm':>10}"
           + (f"{'prev norm':>11}{'delta':>9}  flag" if prev else ""))
    print(hdr)
    print("-" * len(hdr))
    flagged = []
    for q in sorted(cur["queries"]):
        t = cur["queries"][q]
        n = t / cur["cal_med"]
        line = f"{q:<28}{t:>9.3f}{n:>10.2f}"
        if prev:
            pt = prev["queries"].get(q)
            if pt is None:
                line += f"{'new':>11}{'':>9}"
            else:
                pn = pt / prev["cal_med"]
                delta = (n - pn) / pn * 100 if pn else 0.0
                flag = ""
                disp = cur["dispersion"].get(q)
                if disp and len(disp) == 3:
                    lo, _, hi = (x / cur["cal_med"] for x in disp)
                    if pn < lo or pn > hi:
                        flag = "SIGNIFICANT" if abs(delta) >= 10 else "outside-band"
                        flagged.append((q, delta))
                line += f"{pn:>11.2f}{delta:>+8.1f}%  {flag}"
        print(line)

    if prev:
        print()
        dropped = sorted(set(prev["queries"]) - set(cur["queries"]))
        if dropped:
            print(f"dropped queries: {', '.join(dropped)}")
        if flagged:
            print("significant normalized changes (prev outside current "
                  "dispersion band):")
            for q, delta in sorted(flagged, key=lambda x: x[1]):
                print(f"  {q:<28}{delta:+8.1f}%")
        else:
            print("no query moved outside its dispersion band after "
                  "calibration normalization")


if __name__ == "__main__":
    main()
