"""Local oracle sweep at a chosen SF + value-hash stability check.

Usage:
  python scripts/oracle_check.py --sf /root/testdata/sf0.1 --first 50
  python scripts/oracle_check.py --stability --first 50

--sf:        run the first N driver-priority gates through Spark AND their
             DuckDB oracle SQL at the given sf_dir, comparing schema, row
             count and the order-insensitive value multiset (the local
             replica of the driver gate, at a LARGER sf than the suite's
             sf0.01 — magnitude-dependent exactness bugs hide at small SFs;
             VERDICT r5 item 2).
--stability: run each gate TWICE in one session and compare value hashes —
             catches partial-agg-order nondeterminism (the r5 sessionize
             class) before the driver does.
"""

from __future__ import annotations

import argparse
import hashlib
import json
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def normalize(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 6)
    if hasattr(v, "__int__") and not isinstance(v, (bool, float)):
        try:
            return int(v)
        except Exception:
            return v
    return v


def multiset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out: dict = {}
    for r in rows:
        key = tuple(normalize(r[i]) for i in order)
        out[key] = out.get(key, 0) + 1
    return out


def value_hash(cols, rows) -> str:
    ms = multiset(cols, rows)
    payload = json.dumps(sorted((repr(k), v) for k, v in ms.items()))
    return hashlib.md5(payload.encode()).hexdigest()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=None)
    ap.add_argument("--first", type=int, default=50)
    ap.add_argument("--stability", action="store_true")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    from mapbox_filter_spark import queries as q
    from mapbox_filter_spark.session import build_session

    spark = build_session(app_name="oracle-check")
    names = list(q.queries())[:args.first]
    results: dict = {}

    if args.stability:
        sf_dir = args.sf or "/root/testdata/sf0.01"
        for name in names:
            fn = q.queries()[name]
            h = []
            for _ in range(2):
                df = fn(spark, sf_dir)
                h.append(value_hash(df.columns,
                                    [tuple(r) for r in df.collect()]))
            results[name] = {"stable": h[0] == h[1], "hash": h[0]}
            if h[0] != h[1]:
                print(f"UNSTABLE: {name}", flush=True)
        bad = [n for n, r in results.items() if not r["stable"]]
        print(json.dumps({"checked": len(results), "unstable": bad}))
    else:
        import duckdb

        sf_dir = args.sf or "/root/testdata/sf0.1"
        con = duckdb.connect()
        for t in TABLES:
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                        f"'{sf_dir}/{t}.parquet'")
        oracles = q.oracle_sql()
        for name in names:
            fn = q.queries()[name]
            try:
                sdf = fn(spark, sf_dir)
                scols = sdf.columns
                srows = [tuple(r) for r in sdf.collect()]
                if name not in oracles:
                    results[name] = {"status": "rows-only",
                                     "rows": len(srows)}
                    continue
                res = con.execute(oracles[name])
                ocols = [d[0] for d in res.description]
                orows = res.fetchall()
                ok = (sorted(scols) == sorted(ocols)
                      and len(srows) == len(orows)
                      and multiset(scols, srows) == multiset(ocols, orows))
                results[name] = {"status": "pass" if ok else "FAIL",
                                 "rows": len(srows)}
            except Exception as e:  # noqa: BLE001 — sweep must finish
                results[name] = {"status": "ERROR", "err": str(e)[:200]}
            print(name, results[name]["status"], flush=True)
        fails = [n for n, r in results.items()
                 if r["status"] not in ("pass", "rows-only")]
        print(json.dumps({"sf_dir": sf_dir, "checked": len(results),
                          "failures": fails}))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(results, f, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
