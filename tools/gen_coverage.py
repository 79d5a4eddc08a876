#!/usr/bin/env python3
"""Regenerate COVERAGE.md: query key -> implementation file:line -> oracle
status -> dedicated specs. Needs a fresh oracle_sql.json from graft.Verify.

Usage: python3 tools/gen_coverage.py <verifyOutDir>  # dir must hold a CURRENT oracle_sql.json
"""
import glob
import json
import re
import sys


def main(out_dir):
    oracle = set(json.load(open(f"{out_dir}/oracle_sql.json")))
    rows = []
    for f in sorted(glob.glob("src/main/scala/graft/ops/*.scala")):
        txt = open(f).read().splitlines()
        for i, line in enumerate(txt):
            m = re.search(r'^\s*"([a-z0-9_]+)",\s*$', line)
            if m and i > 0 and "Op(" in txt[i - 1]:
                rows.append((m.group(1), f.replace("src/main/scala/", ""), i))
    specs = {}
    for f in glob.glob("src/test/scala/graft/*.scala"):
        name = f.split("/")[-1].replace(".scala", "")
        t = open(f).read()
        for k, _, _ in rows:
            if k in t or k.replace("_", "") in t.lower().replace("_", ""):
                specs.setdefault(k, set()).add(name)
    out = [
        "# COVERAGE — query key → implementation → verification", "",
        "Generated from the source tree (tools/gen_coverage.py). `oracle` = the",
        "driver's DuckDB hash-compare applies; every key additionally runs through",
        "DeterminismSpec (shuffle-partitioning invariance) and the rows-only check.",
        "", "| query key | implementation | oracle | dedicated specs |", "|---|---|---|---|"]
    for k, f, i in sorted(rows):
        sp = ", ".join(sorted(specs.get(k, set()) - {"DeterminismSpec"})) or "—"
        out.append(f"| `{k}` | `{f}:{i}` | {'yes' if k in oracle else 'ScalaTest'} | {sp} |")
    out.append("")
    out.append(f"Totals: {len(rows)} query keys, "
               f"{sum(1 for k, _, _ in rows if k in oracle)} oracle-backed.")
    open("COVERAGE.md", "w").write("\n".join(out) + "\n")
    print(f"wrote COVERAGE.md ({len(rows)} keys)")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/verify_sf0.01")
