"""Local replica of the driver's correctness gate.

Runs every declared query in Spark AND its DuckDB oracle on the same parquet
tables, then compares: row count, schema (column names + coarse types), and
an order-insensitive canonical value hash (columns sorted by name, rows
sorted, values stringified with full precision).

Usage:
    python tools/check.py [--json OUT.json] [sf_dir] [query_name ...]

``--json`` additionally writes a CORRECTNESS-shaped artifact (one object per
query: rows/schema/hash match flags + row counts) — the committed evidence
for queries the driver's 50-row cap leaves without a driver row.
"""

from __future__ import annotations

import hashlib
import json
import math
import sys
import time

sys.path.insert(0, "/root/repo")

import duckdb
import pandas as pd

from mdio_cpp_spark.differential import canon_value, canonical_rows


def _coarse_type(dtype) -> str:
    s = str(dtype)
    if "int" in s:
        return "int"
    if "float" in s or "double" in s:
        return "float"
    if "datetime" in s:
        return "ts"
    if "bool" in s:
        return "bool"
    return "obj"


def canonicalize(df: pd.DataFrame) -> tuple[int, dict[str, str], str]:
    rows = canonical_rows(df)
    h = hashlib.sha256("\x1e".join(rows).encode()).hexdigest()[:16]
    types = {c: _coarse_type(df[c].dtype) for c in sorted(df.columns)}
    return len(df), types, h


def main() -> int:
    from mdio_cpp_spark.catalog import TABLES
    from mdio_cpp_spark.plans import REGISTRY
    from mdio_cpp_spark.session import get_spark

    argv = sys.argv[1:]
    json_out = None
    if "--json" in argv:
        i = argv.index("--json")
        if i + 1 >= len(argv):
            print("usage: check.py [--json OUT.json] [sf_dir] [query ...]")
            return 2
        json_out = argv[i + 1]
        argv = argv[:i] + argv[i + 2:]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    names = argv[1:] or sorted(REGISTRY)
    unknown = [n for n in names if n not in REGISTRY]
    if unknown:
        print(f"unknown query name(s): {unknown}")
        return 2

    spark = get_spark("mdio-check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    failures = []
    results: dict[str, dict] = {}
    for name in names:
        d = REGISTRY[name]
        t0 = time.time()
        try:
            sdf = d.spark(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"FAIL  {name}: spark error: {e}")
            failures.append(name)
            results[name] = {"rows_match": None, "schema_match": None, "hash_match": None,
                             "spark_rows": None, "oracle_rows": None, "err": f"{e}"[:300]}
            continue
        t_spark = time.time() - t0
        if d.oracle is None:
            # the rows-only contract still requires ROWS (the pytest twin
            # asserts the same) — an empty result would be a silent pass
            ok = len(sdf) > 0
            print(f"{'ROWS' if ok else 'FAIL'}  {name}: {len(sdf)} rows (no oracle) [{t_spark:.1f}s]")
            if not ok:
                failures.append(name)
            results[name] = {"rows_match": None, "schema_match": None, "hash_match": None,
                             "spark_rows": len(sdf), "oracle_rows": None,
                             "err": None if ok else "zero rows (rows-only gate)",
                             "gate": "rows-only"}
            continue
        try:
            odf = con.execute(d.oracle).df()
        except Exception as e:
            print(f"FAIL  {name}: duckdb error: {e}")
            failures.append(name)
            results[name] = {"rows_match": None, "schema_match": None, "hash_match": None,
                             "spark_rows": len(sdf), "oracle_rows": None, "err": f"{e}"[:300]}
            continue
        sn, st, sh = canonicalize(sdf)
        on, ot, oh = canonicalize(odf)
        ok = (sn == on) and (st == ot) and (sh == oh)
        status = "PASS" if ok else "FAIL"
        print(f"{status}  {name}: spark {sn} rows / oracle {on} rows, hash {sh} vs {oh} [{t_spark:.1f}s]")
        results[name] = {"rows_match": sn == on, "schema_match": st == ot, "hash_match": sh == oh,
                         "spark_rows": sn, "oracle_rows": on, "err": None}
        if not ok:
            failures.append(name)
            if st != ot:
                print(f"      types spark={st}")
                print(f"      types oracle={ot}")
            if sn == on and sn > 0:
                cols = sorted(sdf.columns)
                s_sorted = sdf[cols].sort_values(cols).reset_index(drop=True)
                o_sorted = odf[cols].sort_values(cols).reset_index(drop=True)
                for i in range(min(len(s_sorted), 2000)):
                    sr, orr = s_sorted.iloc[i], o_sorted.iloc[i]
                    diffs = [
                        (c, sr[c], orr[c])
                        for c in cols
                        if canon_value(sr[c]) != canon_value(orr[c])
                    ]
                    if diffs:
                        print(f"      first diff at sorted row {i}: {diffs}")
                        break

    if json_out:
        with open(json_out, "w") as f:
            json.dump(results, f, indent=1, sort_keys=True)
        print(f"wrote {json_out}")
    print(f"\n{len(names) - len(failures)}/{len(names)} passed")
    if failures:
        print("failing:", " ".join(failures))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
