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
      [--touched=q_a,q_b | --touched-file=FILE |
       --touched-from-git=A..B] [--mover-band=0.10] [--norm=mt|membw]
  python3 tools/bench_compare.py --emit-touched=A..B   # map only

--norm picks the calibration denominator: mt (default, the ALU-bound
LCG probe — every prior round's methodology) or membw (the r16
memory-bandwidth probe, calib_membw_ms — heavy keys are memory-bound,
and r15's boot showed the two probes drifting OPPOSITE ways). The
header always prints both machine ratios when both artifacts carry
both probes, so a verdict can cite whichever tracks the movers.

--touched-from-git derives the commit-to-key map MECHANICALLY from the
source diff (replacing the hand-maintained tools/touched_r{N}.txt):
it parses every src/main/scala/graft file into top-level object
members, seeds the members whose line ranges intersect the diff's
hunks (whole object if object-level lines changed), closes over the
member-mention graph (callers of tainted members become tainted,
cross-object via `Obj.member`, same-object via bare word), and tags a
query key touched when its `"q_..." ->` entry region mentions a
tainted member or was itself edited. Over-approximates (mention-based,
not a real call graph) — which is the safe direction for 'traced'.

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
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SRC = "src/main/scala/graft"


def parse_members(text):
    """(object_name, {member: (start, end)}) for one Scala source; members
    are the object's 2-space-indented defs/vals, region = to next member
    or EOF. Line numbers are 1-based inclusive."""
    lines = text.split("\n")
    obj = None
    starts = []  # (line_no, member_name)
    for i, ln in enumerate(lines, 1):
        m = re.match(r"(?:private(?:\[\w+\])?\s+)?object\s+(\w+)", ln)
        if m and obj is None:
            obj = m.group(1)
        m = re.match(
            r"  (?:private(?:\[\w+\])?\s+|protected\s+|final\s+|lazy\s+|"
            r"override\s+|implicit\s+)*(?:def|val|var)\s+([A-Za-z0-9_]+)",
            ln)
        if m:
            starts.append((i, m.group(1)))
    members = {}
    for idx, (ln, name) in enumerate(starts):
        end = starts[idx + 1][0] - 1 if idx + 1 < len(starts) else len(lines)
        # a member redefined (overload) keeps the widest region
        if name in members:
            s0, e0 = members[name]
            members[name] = (min(s0, ln), max(e0, end))
        else:
            members[name] = (ln, end)
    return obj, members


def parse_key_regions(text):
    """{q_key: [(start, end), ...]} for every '"q_..." ->' entry in a
    pack — a key usually has TWO disjoint regions (queries map entry +
    oracles map entry); they are kept separate, not merged (a merge
    would span the whole file between the two maps)."""
    lines = text.split("\n")
    starts = []
    for i, ln in enumerate(lines, 1):
        m = re.search(r'"(q_[a-z0-9_]+)"\s*->', ln)
        if m:
            starts.append((i, m.group(1)))
    regions = {}
    for idx, (ln, key) in enumerate(starts):
        end = starts[idx + 1][0] - 1 if idx + 1 < len(starts) else len(lines)
        regions.setdefault(key, []).append((ln, end))
    return regions


def diff_hunks(rev_range):
    """{repo-relative path: [(start, end), ...]} of NEW-side changed line
    ranges in the range's diff, main sources only."""
    out = subprocess.run(
        ["git", "diff", "-U0", rev_range, "--", SRC],
        cwd=REPO, capture_output=True, text=True, check=True).stdout
    hunks, path = {}, None
    for ln in out.split("\n"):
        if ln.startswith("+++ b/"):
            path = ln[6:]
        elif ln.startswith("@@") and path:
            m = re.match(r"@@ -\d+(?:,\d+)? \+(\d+)(?:,(\d+))? @@", ln)
            if m:
                start = int(m.group(1))
                n = int(m.group(2)) if m.group(2) is not None else 1
                # pure deletions (n==0) still touch the surrounding line
                hunks.setdefault(path, []).append(
                    (start, start + max(n, 1) - 1))
    return hunks


def overlaps(region, ranges):
    s, e = region
    return any(not (e < a or b < s) for a, b in ranges)


def touched_from_git(rev_range):
    """Mechanical commit-to-key map: seed changed members, close over the
    member-mention graph, tag keys whose entry region mentions a tainted
    member (or was itself edited). Returns a set of q_ keys."""
    files = {}   # path -> (object_name, members, text)
    for fn in sorted(os.listdir(os.path.join(REPO, SRC))):
        if not fn.endswith(".scala"):
            continue
        path = f"{SRC}/{fn}"
        with open(os.path.join(REPO, path)) as f:
            text = f.read()
        obj, members = parse_members(text)
        if obj:
            files[path] = (obj, members, text)
    hunks = diff_hunks(rev_range)
    # seeds: (object, member) whose region intersects a hunk; changed
    # lines OUTSIDE any member region (object-level code, class bodies,
    # top-level helpers the 2-space parse misses) seed the whole object
    tainted = set()
    for path, ranges in hunks.items():
        if path not in files:
            continue  # deleted file: its members can't be mentioned now
        obj, members, _ = files[path]
        covered = []
        for name, region in members.items():
            if overlaps(region, ranges):
                tainted.add((obj, name))
            covered.append(region)
        if any(not overlaps((a, b), covered) for a, b in ranges):
            tainted |= {(obj, name) for name in members}
    # mention graph closure: a member mentioning a tainted member is
    # tainted (cross-object `Obj.member`, same-object bare word)
    changed = True
    while changed:
        changed = False
        for path, (obj, members, text) in files.items():
            lines = text.split("\n")
            for name, (s, e) in members.items():
                if (obj, name) in tainted:
                    continue
                body = "\n".join(lines[s - 1:e])
                for (tobj, tm) in list(tainted):
                    if tobj == obj:
                        hit = re.search(rf"\b{re.escape(tm)}\b", body)
                    else:
                        hit = re.search(
                            rf"\b{re.escape(tobj)}\.{re.escape(tm)}\b",
                            body)
                    if hit:
                        tainted.add((obj, name))
                        changed = True
                        break
    # keys: entry region mentions a tainted member, or was itself edited
    keys = set()
    for path, (obj, members, text) in files.items():
        regions = parse_key_regions(text)
        if not regions:
            continue
        lines = text.split("\n")
        ranges = hunks.get(path, [])
        for key, occs in regions.items():
            for (s, e) in occs:
                if key in keys:
                    break
                if overlaps((s, e), ranges):
                    keys.add(key)
                    break
                body = "\n".join(lines[s - 1:e])
                for (tobj, tm) in tainted:
                    if tobj == obj:
                        hit = re.search(rf"\b{re.escape(tm)}\b", body)
                    else:
                        hit = re.search(
                            rf"\b{re.escape(tobj)}\.{re.escape(tm)}\b",
                            body)
                    if hit:
                        keys.add(key)
                        break
    return keys


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
    norm = "mt"
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
        elif a.startswith("--touched-from-git="):
            got = touched_from_git(a.split("=", 1)[1])
            print(f"# touched-from-git: {len(got)} keys")
            touched |= got
        elif a.startswith("--emit-touched="):
            for k in sorted(touched_from_git(a.split("=", 1)[1])):
                print(k)
            return
        elif a.startswith("--norm="):
            norm = a.split("=", 1)[1]
            if norm not in ("mt", "membw"):
                sys.exit(f"unknown --norm={norm} (mt|membw)")
    if len(args) != 2:
        sys.exit(__doc__)
    old, new = load(args[0]), load(args[1])
    calib_key = "calib_mt_ms" if norm == "mt" else "calib_membw_ms"
    if calib_key not in old or calib_key not in new:
        sys.exit(f"--norm={norm} needs {calib_key} in BOTH artifacts "
                 f"(old: {calib_key in old}, new: {calib_key in new})")
    co, cn = old[calib_key], new[calib_key]
    if "calib_membw_ms" in old and "calib_membw_ms" in new:
        print(f"machine ratios: mt {new['calib_mt_ms'] / old['calib_mt_ms']:.3f}"
              f" | membw {new['calib_membw_ms'] / old['calib_membw_ms']:.3f}"
              f" (normalizing by {calib_key})")
    qo, qn = old["queries"], new["queries"]
    common = sorted(set(qo) & set(qn))
    rows = []
    for k in common:
        so, sn = qo[k], qn[k]
        if max(so, sn) < min_sec:
            continue
        ratio = (sn / cn) / (so / co) if so > 0 and co > 0 else float("nan")
        # ratio <= 0 (a degenerate zero-seconds artifact entry) would
        # crash math.log — treat it like NaN in the flat-band check
        if not ratio > 0 or math.isnan(ratio) or abs(math.log(ratio)) <= \
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
    print(f"{calib_key}: old={co} new={cn} (machine ratio "
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
