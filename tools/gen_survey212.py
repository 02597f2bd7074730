#!/usr/bin/env python3
"""Regenerate SURVEY.md §2.12 from the real sources of truth.

The §2.12 implementation-status ledger rotted once (it said "round 2 /
133 keys" while the driver checked 289) because it was hand-written
prose. This script derives it mechanically:

  - the KEY SET comes from the query packs themselves (every
    `"q_..." ->` binding in src/main/scala/graft/*.scala, i.e. what
    SparkEntry.queries aggregates);
  - ORACLE coverage comes from a Verify dump's oracle_sql.json when one
    is given (the exact map the driver hands to DuckDB);
  - CORRECTNESS status comes from the newest CORRECTNESS_r*.json (the
    driver's own gate artifact).

Usage:  python3 tools/gen_survey212.py [voutdir]
        (voutdir = a `runMain graft.Verify <sf> <voutdir>` output dir;
         optional — without it oracle counts fall back to the key set)

Rewrites the block between the GENERATED:2.12 markers in SURVEY.md
in place; everything outside the markers is untouched.
"""
import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SURVEY = os.path.join(REPO, "SURVEY.md")
SRC = os.path.join(REPO, "src/main/scala/graft")

BEGIN = "<!-- GENERATED:2.12 BEGIN (tools/gen_survey212.py - do not hand-edit) -->"
END = "<!-- GENERATED:2.12 END -->"


def keys_by_module():
    """Every `"q_..." ->` query binding, attributed to its defining file."""
    out = {}
    for path in sorted(glob.glob(os.path.join(SRC, "*.scala"))):
        mod = os.path.basename(path)
        text = open(path).read()
        # bindings inside Map literals: "q_name" -> ((s, dir) => ...)
        for m in re.finditer(r'"(q_[a-z0-9_]+)"\s*->\s*\(\(', text):
            out.setdefault(m.group(1), mod)
    return out


def latest_correctness():
    # sort by NUMERIC round: lexicographic order puts _r9 after _r11
    files = sorted(
        glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")),
        key=lambda f: int(re.search(r"_r(\d+)", os.path.basename(f)).group(1)),
    )
    if not files:
        return None, {}
    return os.path.basename(files[-1]), json.load(open(files[-1]))


def main():
    vout = sys.argv[1] if len(sys.argv) > 1 else None
    key2mod = keys_by_module()
    keys = set(key2mod)
    oracles = None
    if vout and os.path.exists(os.path.join(vout, "oracle_sql.json")):
        oracles = set(json.load(open(os.path.join(vout, "oracle_sql.json"))))
    corr_name, corr = latest_correctness()
    green = {k for k, v in corr.items()
             if v.get("rows_match") and v.get("schema_match")
             and v.get("hash_match")}

    by_mod = {}
    for k, m in key2mod.items():
        by_mod.setdefault(m, []).append(k)

    lines = [BEGIN, ""]
    lines.append(
        f"**{len(keys)} query keys** defined across "
        f"{len(by_mod)} query-pack modules (the set `SparkEntry.queries` "
        f"aggregates)."
        + (f" **{len(oracles & keys)} carry a DuckDB `oracleSql` entry**"
           f" (every key: the non-SQL-expressible ops use constant-floor /"
           f" certificate oracles)." if oracles is not None else ""))
    if corr_name:
        missing = keys - set(corr)
        extra = set(corr) - keys
        lines.append("")
        lines.append(
            f"Latest driver gate `{corr_name}`: **{len(green)} of "
            f"{len(corr)} checked keys green** (rows + schema + hash)."
            + (f" Keys newer than that artifact (green in local Verify,"
               f" enter the driver gate next round): "
               f"{', '.join('`%s`' % k for k in sorted(missing))}."
               if missing else "")
            + (f" Artifact keys since superseded: "
               f"{', '.join('`%s`' % k for k in sorted(extra))}."
               if extra else ""))
    lines.append("")
    lines.append("Per-module ledger — **(!)** marks a key not green in the"
                 " correctness artifact above (a key newer than the"
                 " artifact, or a regression):")
    lines.append("")
    lines.append("| Query-pack module | keys | names |")
    lines.append("|---|---|---|")
    for mod in sorted(by_mod):
        ks = sorted(by_mod[mod])
        names = " ".join(
            f"`{k}`" + ("" if (not corr_name or k in green) else " **(!)**")
            for k in ks)
        lines.append(f"| `{mod}` | {len(ks)} | {names} |")
    lines.append("")
    lines.append(
        "Spec-only components (no oracle reachable in the sandbox: live"
        " JDBC/Kafka/ClickHouse ends, streaming sinks, crash-replay"
        " windows) are covered in ScalaTest — see §5 and the per-round"
        " VERDICT coverage table.")
    lines.append("")
    lines.append(END)
    block = "\n".join(lines)

    text = open(SURVEY).read()
    if BEGIN in text:
        pre, rest = text.split(BEGIN, 1)
        _, post = rest.split(END, 1)
        text = pre + block + post
    else:
        # first run: replace everything between the §2.12 heading and
        # the next section heading with heading + generated block
        m = re.search(r"### 2\.12[^\n]*\n(.*?)(?=\n## )", text, re.S)
        if not m:
            sys.exit("cannot locate §2.12 in SURVEY.md")
        text = (text[:m.start()]
                + "### 2.12 Implementation status (generated)\n\n"
                + block + "\n"
                + text[m.end():])
    open(SURVEY, "w").write(text)
    print(f"[gen_survey212] {len(keys)} keys, "
          f"{len(by_mod)} modules, correctness={corr_name}")


if __name__ == "__main__":
    main()
