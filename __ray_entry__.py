"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship extraction pipeline over pages derived
deterministically from ``/root/testdata/sf0.001/documents.parquet``;
``queries()``/``oracle_sql()`` expose every implemented SURVEY.md §2 operator
(registry in ``metareadability_ray/qa.py``).

Ray is initialised by the driver BEFORE this module is imported: no
``ray.init()`` / ``ray.shutdown()`` anywhere in the library.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

SF_SMOKE_DIR = "/root/testdata/sf0.001"


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001; driver checks rows>=0."""
    import gc

    gc.collect()  # release any previous dataset's actor pool (see queries())
    from metareadability_ray.pipelines.docs2pages import pages_dataset
    from metareadability_ray.pipelines.flagship import extraction_chain

    from metareadability_ray.util import auto_actor_concurrency

    ds = extraction_chain(
        pages_dataset(SF_SMOKE_DIR), num_partitions=8,
        concurrency=auto_actor_concurrency(),
    )
    return ds.select_columns(["url", "headline", "pubdate", "authors", "text"])


def queries() -> dict[str, Callable[[str], Any]]:
    """One entry per implemented operator/pipeline from SURVEY.md §2.

    Each callable first runs gc.collect(): completed datasets leave actor-pool
    worker handles in reference cycles, and each leaked worker pins a CPU —
    collecting at query start releases the PREVIOUS query's pool before this
    one asks for resources (keeps long single-session runs from starving).
    """
    from metareadability_ray.qa import REGISTRY

    def wrap(fn: Callable) -> Callable[[str], Any]:
        def run(sf_dir: str):
            import gc

            gc.collect()
            return fn(sf_dir)

        return run

    return {name: wrap(spec.fn) for name, spec in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for each SQL-expressible query (same column
    names/aliases as the Ray result; omitted → driver rows-only check)."""
    from metareadability_ray.qa import REGISTRY

    return {name: spec.sql for name, spec in REGISTRY.items() if spec.sql is not None}
