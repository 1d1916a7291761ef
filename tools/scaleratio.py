#!/usr/bin/env python3
"""Scaling-curve report: compare two Bench full-report JSON lines
(bench_last.json) from different scale factors and emit a markdown table of
per-query times + the time ratio, sorted by ratio descending.

Usage: scaleratio.py <bench_small.json> <bench_big.json> [data_scale]
data_scale (default 10) is the fixture size ratio: a time ratio well above it
flags a superlinear query; well below it, fixed-overhead domination.
"""
import json
import sys


def load(path):
    with open(path) as f:
        return json.loads(f.readline())


def main(small_path, big_path, data_scale=10.0):
    small, big = load(small_path), load(big_path)
    qs, qb = small["queries"], big["queries"]
    rows = []
    for name in sorted(qs):
        ts, tb = qs.get(name), qb.get(name)
        if ts is None or tb is None or ts < 0 or tb < 0:
            rows.append((float("inf"), name, ts, tb))
            continue
        rows.append((tb / ts if ts > 0 else float("inf"), name, ts, tb))
    rows.sort(reverse=True)
    print(f"| query | t({small['sf']}) s | t({big['sf']}) s | ratio (data x{data_scale:g}) |")
    print("|---|---|---|---|")
    for ratio, name, ts, tb in rows:
        r = "FAIL" if ratio == float("inf") else f"{ratio:.1f}x"
        print(f"| {name} | {ts:.3f} | {tb:.3f} | {r} |")
    tot_s = sum(v for v in qs.values() if v >= 0)
    tot_b = sum(v for v in qb.values() if v >= 0)
    sup = [n for r, n, _, _ in rows if r > 2 * data_scale]
    print(f"\ntotal: {tot_s:.1f} s -> {tot_b:.1f} s "
          f"({tot_b / tot_s:.1f}x on {data_scale:g}x data); "
          f"{len(sup)} queries above {2 * data_scale:g}x: {', '.join(sup) or 'none'}")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2],
         float(sys.argv[3]) if len(sys.argv) > 3 else 10.0)
