"""Local stand-in for the driver's correctness gate.

Runs every qa.REGISTRY query via Ray at the given sf dir AND (where present)
its oracle SQL via DuckDB, then compares row count, column-name set, and an
order-insensitive value hash (columns sorted by name, rows sorted, floats via
repr). Usage::

    python scripts/verify_queries.py [sf_dir] [name ...]
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pyarrow as pa

import ray


def to_table(res) -> pa.Table:
    if isinstance(res, pa.Table):
        return res
    if hasattr(res, "to_arrow_refs"):  # ray Dataset
        import ray as _r

        refs = res.to_arrow_refs()
        tabs = [_r.get(r) for r in refs]
        nonempty = [t for t in tabs if t.num_rows]
        if nonempty:
            return pa.concat_tables(nonempty, promote_options="permissive")
        # all blocks empty: keep the (seeded) schema instead of collapsing to a
        # column-less table — an empty result still owes its column contract.
        # Ray 2.49 emits schema-less empty blocks alongside the seed, so take
        # the first block that actually carries fields.
        for t in tabs:
            if t.schema.names:
                return t
        return pa.table({})
    import pandas as pd

    if isinstance(res, pd.DataFrame):
        return pa.Table.from_pandas(res, preserve_index=False)
    raise TypeError(type(res))


def canon(t: pa.Table) -> tuple[int, tuple, str]:
    cols = sorted(t.column_names)
    t = t.select(cols)
    rows = []
    for row in t.to_pylist():
        rows.append(tuple(_c(row[c]) for c in cols))
    rows.sort(key=repr)
    h = hashlib.md5(repr(rows).encode()).hexdigest()
    return t.num_rows, tuple(cols), h


def _c(v):
    import datetime as dt

    if isinstance(v, float):
        return repr(round(v, 9))
    if isinstance(v, dt.datetime):
        return v.isoformat()
    if isinstance(v, list):
        return tuple(_c(x) for x in v)
    return v


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False, ignore_reinit_error=True)

    from metareadability_ray.qa import REGISTRY

    con = duckdb.connect()
    for name in [
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ]:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{sf_dir}/{name}.parquet')"
        )

    failures = 0
    for name, spec in REGISTRY.items():
        if only and name not in only:
            continue
        t0 = time.perf_counter()
        try:
            ray_t = to_table(spec.fn(sf_dir))
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: ray raised {type(e).__name__}: {e}")
            failures += 1
            continue
        finally:
            import gc

            gc.collect()  # release the query's actor pool
        ray_s = time.perf_counter() - t0
        if spec.sql is None:
            print(f"ok   {name}: rows-only rows={ray_t.num_rows} cols={sorted(ray_t.column_names)} ({ray_s:.1f}s)")
            continue
        try:
            sql_t = con.execute(spec.sql).fetch_arrow_table()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: sql raised {type(e).__name__}: {e}")
            failures += 1
            continue
        rn, rc, rh = canon(ray_t)
        sn, sc, sh = canon(sql_t)
        if (rn, rc, rh) == (sn, sc, sh):
            print(f"PASS {name}: rows={rn} ({ray_s:.1f}s)")
        else:
            failures += 1
            print(f"FAIL {name}: ray(rows={rn}, cols={rc}) vs sql(rows={sn}, cols={sc}) hash_eq={rh == sh}")
            if rc == sc and rn == sn:
                # value diff — show first mismatching row
                rt = sorted(map(repr, to_rows(ray_t)))
                st = sorted(map(repr, to_rows(sql_t)))
                for a, b in zip(rt, st):
                    if a != b:
                        print(f"  ray: {a}\n  sql: {b}")
                        break
    return 1 if failures else 0


def to_rows(t: pa.Table):
    cols = sorted(t.column_names)
    t = t.select(cols)
    return [tuple(_c(r[c]) for c in cols) for r in t.to_pylist()]


if __name__ == "__main__":
    sys.exit(main())
