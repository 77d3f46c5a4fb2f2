#!/usr/bin/env python3
"""Compare a bench_full.json run against the anchored per-query floors.

The floors (BENCH_FLOORS.json) are a clean 3-pass Bench run recorded on
the current host with no concurrent load (SCALE.md "r9 bench re-anchor").
This script turns "did anything regress?" into a mechanical check instead
of cross-round table reading:

    python3 tools/bench_compare.py [bench_full.json] [--threshold 1.5]

Prints every query whose warm time exceeds floor*threshold (sorted by
ratio), new/removed queries, and the total delta. Exits 1 if any query
breaches the threshold — suitable as a round-end gate. Queries under
0.3 s at the floor are reported but never gate (sub-300ms timings are
noise-dominated at this harness's resolution).
"""
import argparse
import json
import sys


def main() -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("bench_path", nargs="?", default="bench_full.json")
    p.add_argument("--threshold", type=float, default=1.5)
    ns = p.parse_args()
    bench_path = ns.bench_path
    threshold = ns.threshold

    floors_doc = json.load(open("BENCH_FLOORS.json"))
    floors = floors_doc["queries"]
    # per-query harness corrections: a few floors are systematically lower
    # under this repo's sbt harness than under the driver's (fixed
    # streaming-start costs measure differently across harness states) —
    # each correction multiplies the floor and must carry cross-round
    # driver-side evidence in the adjacent "_note" key.
    corrections = floors_doc.get("harness_corrections", {})
    applied = []
    for q, factor in corrections.items():
        if q.startswith("_"):
            continue  # evidence keys (_note, _note_<q>), not corrections
        # every correction must carry its OWN evidence entry (_note_<q>):
        # a bare factor is an invisible loosening of the regression gate,
        # and a single shared "_note" would let any future bare correction
        # ride on an unrelated query's evidence — refuse to run.
        if f"_note_{q}" not in corrections:
            print(f"FAIL: harness correction for '{q}' lacks its own "
                  f"_note_{q} evidence entry in BENCH_FLOORS.json")
            return 1
        if q in floors:
            floors[q] = floors[q] * factor
            applied.append((q, factor, floors[q]))
    # corrections are never silent: show exactly how much each one loosens
    # the gate so a regression can't hide behind an inflated floor.
    for q, factor, eff in applied:
        print(f"harness correction applied: {q} floor x{factor:.3f} -> {eff:.2f}s")
    run = json.load(open(bench_path))
    cur = run["queries"]

    # host-speed calibration (Bench calib_s: single-thread xorshift spin).
    # When BOTH the floors and the run carry a calibration, ratios are
    # normalized by the host-speed ratio before gating — a VM whose CPU got
    # 30% slower shifts every query uniformly (r12 measured a 1.33x median
    # shift with byte-identical code) and would otherwise read as a hundred
    # simultaneous regressions. The normalization factor is always printed;
    # floors without calib_s (pre-r12 anchors) gate on raw ratios.
    host = 1.0
    run_calib = run.get("calib_s")
    floor_calib = floors_doc.get("calib_s")
    if run_calib and floor_calib:
        host = run_calib / floor_calib
        print(f"host calibration: floors {floor_calib:.2f}s -> run {run_calib:.2f}s "
              f"(x{host:.2f}); gating on calib-normalized ratios")
    elif run_calib:
        print(f"host calibration: run {run_calib:.2f}s (floors carry none — raw gating)")
    elif floor_calib:
        # the asymmetric silent branch would let a pre-calibration run's
        # uniform host-speed delta read as a fleet of regressions with no
        # hint that normalization was unavailable — be loud about it
        print(f"host calibration: floors carry {floor_calib:.2f}s but the run has no "
              "calib_s (pre-r12 bench_full.json?) — raw gating, host shifts unattributed")

    new = sorted(set(cur) - set(floors))
    gone = sorted(set(floors) - set(cur))
    rows = []
    for q in sorted(set(cur) & set(floors)):
        f, c = floors[q], cur[q]
        rows.append(((c / host) / f if f > 0 else float("inf"), q, f, c))
    rows.sort(reverse=True)

    breaches = [r for r in rows if r[0] > threshold and r[2] >= 0.3]
    print(f"floors: {len(floors)} queries, run: {len(cur)} queries, threshold {threshold}x")
    if new:
        print(f"new (no floor yet): {', '.join(new)}")
    if gone:
        print(f"missing vs floors: {', '.join(gone)}")
    print(f"{'ratio':>7} {'floor':>7} {'run':>7}  query")
    for ratio, q, f, c in rows[:15]:
        flag = " <-- REGRESSION" if (ratio > threshold and f >= 0.3) else ""
        print(f"{ratio:7.2f} {f:7.2f} {c:7.2f}  {q}{flag}")
    tf = sum(floors[q] for q in set(cur) & set(floors))
    tc = sum(cur[q] for q in set(cur) & set(floors))
    if host != 1.0:
        # normalize the headline too — gating just attributed the uniform
        # shift to the host, so the totals line must not re-report it as a
        # tree-wide regression
        print(f"shared-query totals: floor {tf:.1f}s -> run {tc:.1f}s raw "
              f"({tc / tf:.2f}x), {tc / host:.1f}s calib-normalized ({tc / host / tf:.2f}x)")
    else:
        print(f"shared-query totals: floor {tf:.1f}s -> run {tc:.1f}s ({tc / tf:.2f}x)")
    # sub-cutoff WATCH (r17, VERDICT r16 #3): queries whose floor sits under
    # the 0.3 s noise cutoff can never gate, so a real regression in one
    # could hide forever behind the exemption. Never a failure (that's the
    # cutoff's whole point — sub-300ms timings are noise-dominated at this
    # harness's resolution), but always VISIBLE: persistent appearances
    # round over round are the signal to grow the face to a gateable size
    # (the q_top_per_group precedent — grown from a 2% slice in r17).
    watch = [r for r in rows if r[0] > threshold and r[2] < 0.3]
    if watch:
        print("sub-cutoff watch (floor < 0.3s, above threshold — reported, never gated): "
              + ", ".join(f"{q} {ratio:.2f}x ({f:.2f}->{c:.2f}s)" for ratio, q, f, c in watch))
    if breaches:
        print(f"FAIL: {len(breaches)} queries above {threshold}x floor")
        return 1
    print("OK: no query above threshold")
    return 0


if __name__ == "__main__":
    sys.exit(main())
