#!/usr/bin/env python
"""Local simulation of the driver's correctness gate: run every
``queries()`` entry at sf0.01 next to its ``oracle_sql()`` twin in DuckDB
and report rows/schema/value-hash matches. Usage:

    python scripts/driver_sim.py [--sf /root/testdata/sf0.01] [--only q1,q2]
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def _hash_df(df) -> str:
    import pandas as pd

    df = df[sorted(df.columns)]
    df = df.sort_values(list(df.columns)).reset_index(drop=True)
    return hashlib.md5(
        pd.util.hash_pandas_object(df.astype(str), index=False).values.tobytes()
    ).hexdigest()


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--only", default="")
    args = ap.parse_args()

    import duckdb
    import pandas as pd

    import ray

    ray.init(
        address="local",
        num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "ray_entry", os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "__ray_entry__.py")
    )
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)

    qs = m.queries()
    from khl_pdf_ocr_ray.pipelines.queries import oracles
    from khl_pdf_ocr_ray.state.oracle_dump import ORACLE_SF

    # the real driver always compares at ORACLE_SF; for other --sf values
    # the dump-backed oracles must be built FOR that sf dir or every
    # dump-backed query would be compared against the wrong corpus
    sqls = m.oracle_sql() if args.sf == ORACLE_SF else oracles(args.sf)
    only = set(args.only.split(",")) if args.only else None

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{args.sf}/{t}.parquet')"
        )

    results = {}
    n_green = n_rows_only = n_fail = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            res = fn(args.sf)
            df = res.to_pandas() if hasattr(res, "to_pandas") else res
            if not isinstance(df, pd.DataFrame):
                df = df.to_pandas()
            if name not in sqls:
                results[name] = {"rows": len(df), "err": "no_oracle"}
                n_rows_only += 1
                continue
            odf = con.execute(sqls[name]).df()
            rows = len(df) == len(odf)
            schema = sorted(df.columns) == sorted(odf.columns)
            vhash = rows and schema and _hash_df(df) == _hash_df(odf)
            ok = rows and schema and vhash
            results[name] = {
                "rows_match": rows, "schema_match": schema, "hash_match": vhash,
                "spark_rows": len(df), "oracle_rows": len(odf),
            }
            if ok:
                n_green += 1
            else:
                n_fail += 1
                results[name]["cols"] = [sorted(df.columns), sorted(odf.columns)]
        except Exception as e:  # noqa: BLE001
            results[name] = {"err": f"{type(e).__name__}: {e}"}
            n_fail += 1
        status = results[name]
        flag = "OK " if status.get("hash_match") else (
            "RO " if status.get("err") == "no_oracle" else "BAD")
        print(f"{flag} {name}: {json.dumps(status)[:200]}", flush=True)

    print(json.dumps({"green": n_green, "rows_only": n_rows_only, "fail": n_fail}))
    ray.shutdown()
    return 0 if n_fail == 0 else 1


if __name__ == "__main__":
    sys.exit(main())
