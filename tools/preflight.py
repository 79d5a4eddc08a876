#!/usr/bin/env python3
"""Local pre-flight of the driver's DuckDB oracle compare (SURVEY.md §5.1).

Usage: python3 tools/preflight.py <sfDir> <verifyOutDir>

Reads <verifyOutDir>/oracle_sql.json (written by graft.Verify), runs each SQL
in DuckDB against the parquet tables in <sfDir>, reads the Spark result
parquet from <verifyOutDir>/<query>/, and compares columns (sorted by name),
row counts, and every value exactly. Exit code = number of failing queries.
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def cell_eq(a, b):
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    if isinstance(a, list) and isinstance(b, list):
        return len(a) == len(b) and all(cell_eq(x, y) for x, y in zip(a, b))
    # duckdb may hand back Decimal vs float across the two reads
    try:
        if a == b:
            return True
    except Exception:
        pass
    return str(a) == str(b)


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    failures = []
    for name in sorted(oracles):
        sql = oracles[name]
        try:
            odf = con.execute(sql).fetchdf()
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: oracle SQL error: {e}")
            continue
        try:
            sdf = con.execute(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").fetchdf()
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: spark result unreadable: {e}")
            continue
        # The driver's checker sorts rows via pandas factorize, which dies on
        # non-scalar cells (round-1: agg_collect_sorted/array_funcs). Reject
        # array/map/struct output columns here so that failure class can never
        # pass preflight again.
        stypes = con.execute(
            f"DESCRIBE SELECT * FROM '{out_dir}/{name}/*.parquet'").fetchall()
        nested = [(c, t) for c, t, *_ in stypes
                  if "[]" in t or t.startswith(("STRUCT", "MAP", "LIST"))
                  or "DECIMAL" in t]
        if nested:
            failures.append(name)
            print(f"FAIL {name}: driver-unhashable column types: {nested} "
                  f"(emit as concat_ws/array_to_string strings instead)")
            continue
        ocols, scols = sorted(odf.columns), sorted(sdf.columns)
        if ocols != scols:
            failures.append(name)
            print(f"FAIL {name}: columns differ oracle={ocols} spark={scols}")
            continue
        if len(odf) != len(sdf):
            failures.append(name)
            print(f"FAIL {name}: rows differ oracle={len(odf)} spark={len(sdf)}")
            continue
        bad = None
        for c in ocols:
            ov, sv = odf[c].tolist(), sdf[c].tolist()
            for i, (a, b) in enumerate(zip(ov, sv)):
                if not cell_eq(a, b):
                    bad = (c, i, a, b)
                    break
            if bad:
                break
        if bad:
            failures.append(name)
            c, i, a, b = bad
            print(f"FAIL {name}: col {c} row {i}: oracle={a!r} spark={b!r}")
        else:
            print(f"ok   {name}: {len(odf)} rows")
    print(f"\n{len(oracles) - len(failures)}/{len(oracles)} queries match")
    return len(failures)


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
