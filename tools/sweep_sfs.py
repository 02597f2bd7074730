#!/usr/bin/env python3
"""Three-SF correctness sweep — the artifact behind the "all oracles
green at every scale factor" claim.

Runs graft.Verify + the DuckDB oracle compare (tools/check.py) at each
of sf0.001 / sf0.01 / sf0.1 and merges the per-key results into
CORRECTNESS_SFS.json at the repo root: every oracled key carries an
`sfs_passed` list, so the claim is backed by a committed artifact
instead of prose.

Usage: python3 tools/sweep_sfs.py [out.json]
"""
import datetime
import json
import os
import subprocess
import sys

import check

SFS = ["0.001", "0.01", "0.1"]
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main(out_path):
    per_sf = {}
    for sf in SFS:
        sfdir = f"/root/testdata/sf{sf}"
        vout = f"/tmp/graft_sweep_sf{sf}"
        print(f"== Verify @ sf{sf} ==", flush=True)
        subprocess.run(
            ["sbt", "-batch", f"runMain graft.Verify {sfdir} {vout}"],
            cwd=REPO, check=True, stdout=subprocess.DEVNULL,
            stderr=subprocess.DEVNULL)
        jo = f"{vout}/check.json"
        check.main(sfdir, vout, jo)
        per_sf[f"sf{sf}"] = json.load(open(jo))
    keys = {}
    for sf, res in per_sf.items():
        for k, r in res["keys"].items():
            keys.setdefault(k, {"sfs_passed": [], "sfs_failed": []})
            dest = "sfs_passed" if r["status"] == "pass" else "sfs_failed"
            keys[k][dest].append(sf)
    artifact = {
        "generated_utc": datetime.datetime.now(
            datetime.timezone.utc).isoformat(timespec="seconds"),
        "summary": {sf: {"n_pass": r["n_pass"], "n_fail": r["n_fail"]}
                    for sf, r in per_sf.items()},
        "all_green": all(r["n_fail"] == 0 for r in per_sf.values()),
        "keys": keys,
    }
    with open(out_path, "w") as f:
        json.dump(artifact, f, indent=1, sort_keys=True)
    print(json.dumps(artifact["summary"], indent=1, sort_keys=True))
    print(f"all_green={artifact['all_green']} -> {out_path}")
    return 0 if artifact["all_green"] else 1


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else \
        os.path.join(REPO, "CORRECTNESS_SFS.json")
    sys.exit(main(out))
