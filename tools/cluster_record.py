#!/usr/bin/env python3
"""Assemble BENCH_CLUSTER_SF30.json from the 43-query battery plus
isolation re-times, then print the BASELINE.md analysis table.

Round-17 measurement-hygiene protocol (VERDICT r16 "Next round" #1):
the full battery runs 5x/query on an idle machine; queries whose
max/med scatter still exceeds 1.5x (cold-run excluded) are re-timed in
isolation with 5 more runs, and the record carries the re-timed entry
(flagged in `retimed`). Single-JVM comparison = BENCH_SF30.json +
BENCH_SF30_TPCDS.json medians.

Usage: cluster_record.py <battery.json> <retimes.json|-> <out.json>
"""
import json
import statistics as st
import sys


def load(p):
    with open(p) as f:
        return json.load(f)


def main():
    battery_p, retimes_p, out_p = sys.argv[1], sys.argv[2], sys.argv[3]
    battery = load(battery_p)
    retimed = []
    if retimes_p != "-":
        re_q = load(retimes_p)["queries"]
        for name, entry in re_q.items():
            # a typo'd retime name must not silently ADD a query (inflating
            # the summed value while n_queries goes stale) — ADVICE r17
            assert name in battery["queries"], (
                f"retime '{name}' is not in the battery — typo?")
            battery["queries"][name] = entry
            retimed.append(name)
    battery["retimed_in_isolation"] = sorted(retimed)
    assert battery["n_queries"] == len(battery["queries"]), (
        f"n_queries {battery['n_queries']} != {len(battery['queries'])}")
    total = sum(q["med"] for q in battery["queries"].values())
    battery["value"] = round(total, 3)
    with open(out_p, "w") as f:
        json.dump(battery, f)
    print(f"wrote {out_p}: {battery['n_queries']} queries, "
          f"total_median {battery['value']}s, {len(retimed)} retimed")

    sj = {**load("/root/repo/BENCH_SF30.json")["queries"],
          **load("/root/repo/BENCH_SF30_TPCDS.json")["queries"]}
    rows = []
    for name, c in sorted(battery["queries"].items()):
        s = sj.get(name)
        if not s:
            continue
        warm = c["runs"][1:] if len(c["runs"]) > 2 else c["runs"]
        scatter = max(warm) / st.median(warm)
        rows.append((name, c["med"], c["min"], s["med"],
                     c["med"] / s["med"], c["min"] / s["min"], scatter))
    rows.sort(key=lambda r: -r[4])
    print(f"\n{'query':28s} {'cl_med':>8s} {'cl_min':>8s} {'sj_med':>8s} "
          f"{'med_ratio':>9s} {'min_ratio':>9s} {'warm_sc':>7s}")
    for r in rows:
        print(f"{r[0]:28s} {r[1]:8.2f} {r[2]:8.2f} {r[3]:8.2f} "
              f"{r[4]:9.2f} {r[5]:9.2f} {r[6]:7.2f}")
    tot_c = sum(r[1] for r in rows)
    tot_s = sum(r[3] for r in rows)
    over = [r for r in rows if r[6] > 1.5]
    print(f"\ntotals (common {len(rows)}q): cluster {tot_c:.1f}s vs "
          f"single-JVM {tot_s:.1f}s = {tot_c / tot_s:.2f}x | "
          f"queries with warm scatter >1.5x: {len(over)} "
          f"({', '.join(r[0] for r in over) or 'none'})")


if __name__ == "__main__":
    main()
