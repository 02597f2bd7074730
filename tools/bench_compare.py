#!/usr/bin/env python3
"""Adjudicate bench swings mechanically: normalized per-key ratios
between two bench artifacts (bench_last.json shape, any round's
BENCH_r{N}.json works too if it carries the full queries map).

Normalization divides each artifact's seconds by its own calib_mt_ms,
so machine drift between boots divides out; what remains is plan/code
drift plus run-to-run noise. Where the artifacts carry queries_runs
(round 13+), each mover is AUTO-TAGGED with the three buckets the
round-14 verdict assigned by hand:

  noise       the two sides' own run spreads cover the ratio: the
              normalized run intervals [min,max]/calib overlap enough
              that a ratio of 1.0 is inside the cross-interval range
  traced      the key is in the round's commit-to-key map (supplied
              via --touched=k1,k2 or --touched-file=keys.txt, one key
              per line, '#' comments — derived by the round's author
              from `git log --stat`, e.g. "LlmOps prefix join rewrite
              -> q_dedup_ngram_jaccard"), so the swing has a commit to
              point at
  unexplained neither — the bucket worth archaeology
  flat        not a mover (ratio within --mover-band of 1.0)

Usage:
  python3 tools/bench_compare.py OLD.json NEW.json [--min-sec=0.5]
      [--touched=q_a,q_b | --touched-file=FILE] [--mover-band=0.10]

BENCH_r{N}.json artifacts carry only the top-24 stdout subset WITHOUT
per-run data (noise tagging degrades to flat/traced/unexplained).
For full-coverage noise tagging, compare the rounds' committed
bench_last.json snapshots instead:
  git show <r13-commit>:bench_last.json > /tmp/old.json
  git show <r14-commit>:bench_last.json > /tmp/new.json
  python3 tools/bench_compare.py /tmp/old.json /tmp/new.json ...

Prints per-key normalized ratio (new/old) sorted descending with run
spreads and tags, the geomean over all common keys and over heavy keys
(raw >= 1s in either artifact), and a tag summary.
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


def noise_covers(old, new, key, co, cn):
    """True iff the two artifacts' own run spreads can explain the
    ratio: the interval of normalized ratios reachable by picking any
    (old_run, new_run) pair contains 1.0."""
    ro = old.get("queries_runs", {}).get(key)
    rn = new.get("queries_runs", {}).get(key)
    if not ro or not rn or min(ro) <= 0 or min(rn) <= 0:
        return False
    lo = (min(rn) / cn) / (max(ro) / co)   # most-favorable pairing
    hi = (max(rn) / cn) / (min(ro) / co)   # least-favorable pairing
    return lo <= 1.0 <= hi


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    min_sec = 0.0
    mover_band = 0.10
    touched = set()
    for a in sys.argv[1:]:
        if a.startswith("--min-sec="):
            min_sec = float(a.split("=", 1)[1])
        elif a.startswith("--mover-band="):
            mover_band = float(a.split("=", 1)[1])
        elif a.startswith("--touched="):
            touched |= {k for k in a.split("=", 1)[1].split(",") if k}
        elif a.startswith("--touched-file="):
            with open(a.split("=", 1)[1]) as f:
                for line in f:
                    line = line.split("#", 1)[0].strip()
                    if line:
                        touched.add(line.split()[0])
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
        if math.isnan(ratio) or abs(math.log(ratio)) <= \
                abs(math.log(1.0 + mover_band)):
            tag = "flat"
        elif noise_covers(old, new, k, co, cn):
            tag = "noise"
        elif k in touched:
            tag = "traced"
        else:
            tag = "unexplained"
        rows.append((ratio, k, so, sn, tag))
    rows.sort(reverse=True)
    print(f"calib_mt_ms: old={co} new={cn} (machine ratio "
          f"{cn / co:.3f}); {len(common)} common keys, "
          f"{len(rows)} shown (min_sec={min_sec}, "
          f"mover_band=±{mover_band:.0%}, {len(touched)} touched keys)")
    print(f"{'key':<34} {'old_s':>8} {'new_s':>8} {'norm_ratio':>10} "
          f"{'old_spread':>10} {'new_spread':>10}  tag")
    for ratio, k, so, sn, tag in rows:
        print(f"{k:<34} {so:>8.3f} {sn:>8.3f} {ratio:>10.3f} "
              f"{spread(old, k):>10} {spread(new, k):>10}  {tag}")

    def geomean(sel):
        vals = [r for r, k, so, sn, t in rows if sel(so, sn)
                and r > 0 and not math.isnan(r)]
        if not vals:
            return float("nan")
        return math.exp(sum(math.log(v) for v in vals) / len(vals))

    print(f"\ngeomean (all shown): {geomean(lambda o, n: True):.3f}")
    print(f"geomean (heavy, >=1s either side): "
          f"{geomean(lambda o, n: max(o, n) >= 1.0):.3f}")
    counts = {}
    for _, k, _, _, tag in rows:
        counts[tag] = counts.get(tag, 0) + 1
    print("tags: " + ", ".join(f"{t}={counts.get(t, 0)}" for t in
                               ("flat", "noise", "traced", "unexplained")))
    unexplained = [k for _, k, _, _, t in rows if t == "unexplained"]
    if unexplained:
        print("unexplained movers (adjudicate by hand): "
              + ", ".join(unexplained))


if __name__ == "__main__":
    main()
