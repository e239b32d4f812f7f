#!/usr/bin/env python
"""Local stand-in for the driver's CORRECTNESS gate.

Runs every ``queries()`` entry at the given sf dir, runs its
``oracle_sql()`` in DuckDB over the same parquet tables, and compares
rows + column names + a canonical value hash (columns sorted by name,
rows sorted, floats via repr) — the same spirit as the driver's check.

Usage: python scripts/gate_check.py [sf_dir] [only_query ...]
"""

from __future__ import annotations

import hashlib
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def canon_cell(v):
    if isinstance(v, float):
        return repr(round(v, 9))
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon_cell(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{canon_cell(v[k])}" for k in sorted(v)) + "}"
    return str(v)


def value_hash(cols: list[str], rows: list[tuple]) -> str:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    canon = sorted(
        "|".join(canon_cell(r[i]) for i in order) for r in rows
    )
    h = hashlib.sha256()
    for line in canon:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import duckdb

    from darc_spark.session import get_spark

    import __spark_entry__ as E

    spark = get_spark("gate-check", master="local[16]", shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")
    queries, oracles = E.queries(), E.oracle_sql()
    results: dict[str, dict] = {}
    failed = 0
    for name, fn in queries.items():
        if only and name not in only:
            continue
        entry: dict = {}
        try:
            df = fn(spark, sf_dir)
            cols = list(df.columns)
            rows = [tuple(r) for r in df.collect()]
            entry["spark_rows"] = len(rows)
            sql = oracles.get(name)
            if sql is None:
                entry["status"] = "rows_only"
                results[name] = entry
                print(f"{name:28s} rows-only ({len(rows)} rows)")
                continue
            con = duckdb.connect()
            for t in TABLES:
                con.execute(
                    f"create view {t} as select * from "
                    f"read_parquet('{sf_dir}/{t}.parquet')"
                )
            cur = con.execute(sql)
            ocols = [d[0] for d in cur.description]
            orows = [tuple(r) for r in cur.fetchall()]
            con.close()
            entry["oracle_rows"] = len(orows)
            entry["rows_match"] = len(rows) == len(orows)
            entry["schema_match"] = sorted(cols) == sorted(ocols)
            entry["hash_match"] = value_hash(cols, rows) == value_hash(
                ocols, orows
            )
            ok = (
                entry["rows_match"]
                and entry["schema_match"]
                and entry["hash_match"]
            )
            entry["status"] = "pass" if ok else "FAIL"
            if not ok:
                failed += 1
            print(
                f"{name:28s} {entry['status']}  "
                f"spark={len(rows)} oracle={len(orows)} "
                f"schema={entry['schema_match']} hash={entry['hash_match']}"
            )
        except Exception as exc:  # noqa: BLE001 - report, keep going
            entry["status"] = "ERROR"
            entry["err"] = f"{type(exc).__name__}: {exc}"
            failed += 1
            print(f"{name:28s} ERROR {entry['err'][:140]}")
        results[name] = entry
    spark.stop()
    n = len(results)
    npass = sum(1 for e in results.values() if e.get("status") == "pass")
    print(
        json.dumps(
            {"sf_dir": sf_dir, "total": n, "pass": npass, "failed": failed}
        )
    )
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
