"""Self-check harness mimicking the driver's correctness gate: run every
``queries()`` entry and its ``oracle_sql()`` twin on the same sf dir, compare
row count, schema (column names) and an order-insensitive value hash.

Usage: python scripts/oracle_check.py [sf_dir] [query ...]
"""
from __future__ import annotations

import sys

import duckdb
import pandas as pd

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def _to_pandas(res) -> pd.DataFrame:
    import ray.data

    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if hasattr(res, "to_pandas"):
        return res.to_pandas()
    return pd.DataFrame(res)


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def value_hash(df: pd.DataFrame) -> str:
    import hashlib

    payload = df.to_csv(index=False, float_format="%.9g").encode()
    return hashlib.md5(payload).hexdigest()


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import ray

    if not ray.is_initialized():
        ray.init(
            address="local", num_cpus=8, include_dashboard=False,
            ignore_reinit_error=True,
        )

    sys.path.insert(0, ".")
    import __ray_entry__ as entry

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    qs = entry.queries()
    oracles = entry.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            mine = canon(_to_pandas(fn(sf_dir)))
        except Exception as e:
            print(f"FAIL {name}: query raised {type(e).__name__}: {e}")
            failures += 1
            continue
        if name not in oracles:
            print(f"rows-only {name}: {len(mine)} rows, cols={list(mine.columns)}")
            continue
        try:
            want = canon(con.execute(oracles[name]).df())
        except Exception as e:
            print(f"FAIL {name}: oracle raised {type(e).__name__}: {e}")
            failures += 1
            continue
        problems = []
        if list(mine.columns) != list(want.columns):
            problems.append(f"cols {list(mine.columns)} != {list(want.columns)}")
        elif list(mine.dtypes.astype(str)) != list(want.dtypes.astype(str)):
            problems.append(
                f"dtypes {dict(mine.dtypes.astype(str))} != {dict(want.dtypes.astype(str))}"
            )
        elif len(mine) != len(want):
            problems.append(f"rows {len(mine)} != {len(want)}")
        elif value_hash(mine) != value_hash(want):
            problems.append("value hash mismatch")
            diff = mine.compare(want) if mine.shape == want.shape else None
            if diff is not None and len(diff):
                problems.append(f"first diffs:\n{diff.head(5)}")
        if problems:
            failures += 1
            print(f"FAIL {name}: " + "; ".join(problems))
        else:
            print(f"OK   {name}: {len(mine)} rows")
    ray.shutdown()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
