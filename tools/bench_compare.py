#!/usr/bin/env python3
"""Adjudicate bench swings mechanically: normalized per-key ratios
between two bench artifacts (bench_last.json shape, any round's
BENCH_r{N}.json works too if it carries the full queries map).

Normalization divides each artifact's seconds by its own calib_mt_ms,
so machine drift between boots divides out; what remains is plan/code
drift plus run-to-run noise. Where the artifact carries queries_runs
(round 13+), the key's own run spread is printed next to the ratio so
a "x2.3 swing" whose two runs span x2 reads as noise, not regression.

Usage:
  python3 tools/bench_compare.py OLD.json NEW.json [--min-sec=0.5]

Prints per-key normalized ratio (new/old) sorted descending, the
geomean over all common keys and over heavy keys (raw >= 1s in either
artifact), and each side's run spread when available.
Driver-side tooling only - not part of the library.
"""
import json
import math
import sys


def load(path):
    with open(path) as f:
        d = json.loads(f.read().strip())
    # BENCH_r{N}.json wraps the stdout line under 'parsed' (top-24
    # subset only); bench_last.json is the flat full map
    return d.get("parsed", d)


def spread(art, key):
    runs = art.get("queries_runs", {}).get(key)
    if not runs or min(runs) <= 0:
        return ""
    return f"{max(runs) / min(runs):.2f}"


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    min_sec = 0.0
    for a in sys.argv[1:]:
        if a.startswith("--min-sec="):
            min_sec = float(a.split("=", 1)[1])
    if len(args) != 2:
        sys.exit(__doc__)
    old, new = load(args[0]), load(args[1])
    co, cn = old["calib_mt_ms"], new["calib_mt_ms"]
    qo, qn = old["queries"], new["queries"]
    common = sorted(set(qo) & set(qn))
    rows = []
    for k in common:
        so, sn = qo[k], qn[k]
        if max(so, sn) < min_sec:
            continue
        ratio = (sn / cn) / (so / co) if so > 0 and co > 0 else float("nan")
        rows.append((ratio, k, so, sn))
    rows.sort(reverse=True)
    print(f"calib_mt_ms: old={co} new={cn} (machine ratio "
          f"{cn / co:.3f}); {len(common)} common keys, "
          f"{len(rows)} shown (min_sec={min_sec})")
    print(f"{'key':<34} {'old_s':>8} {'new_s':>8} {'norm_ratio':>10} "
          f"{'old_spread':>10} {'new_spread':>10}")
    for ratio, k, so, sn in rows:
        print(f"{k:<34} {so:>8.3f} {sn:>8.3f} {ratio:>10.3f} "
              f"{spread(old, k):>10} {spread(new, k):>10}")

    def geomean(sel):
        vals = [r for r, k, so, sn in rows if sel(so, sn)
                and r > 0 and not math.isnan(r)]
        if not vals:
            return float("nan")
        return math.exp(sum(math.log(v) for v in vals) / len(vals))

    print(f"\ngeomean (all shown): {geomean(lambda o, n: True):.3f}")
    print(f"geomean (heavy, >=1s either side): "
          f"{geomean(lambda o, n: max(o, n) >= 1.0):.3f}")


if __name__ == "__main__":
    main()
