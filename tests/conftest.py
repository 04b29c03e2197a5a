"""Shared fixtures. Ray is initialised ONCE per pytest session (SURVEY.md §5)."""

from __future__ import annotations

import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))


@pytest.fixture(scope="session")
def ray_session():
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            # 8, not 4: Ray 2.49 leaks a MapWorker actor handle whenever a
            # test failure's retained traceback pins a completed dataset;
            # each pinned actor holds 1 CPU for the rest of the session, and
            # at 4 CPUs a few of them starve every later actor-pool stage
            # into a silent wedge (observed: conformance runs stalling in
            # HyperplaneLSH). The headroom keeps one failure from cascading
            # into a hung suite.
            num_cpus=8,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    yield ray
    # Shut down in a bounded thread: a wedged cluster (leaked actor-pool
    # workers, see ray#53727-adjacent teardown failures) can hang
    # ray.shutdown() forever, which would swallow pytest's failure report.
    import threading

    t = threading.Thread(target=ray.shutdown, daemon=True)
    t.start()
    t.join(timeout=30)


@pytest.fixture(autouse=True)
def _release_actor_pools():
    """Break the reference cycles that keep completed datasets' actor-pool
    workers alive (each holds a CPU; enough leaks wedge the 4-CPU session)."""
    yield
    import gc

    gc.collect()


@pytest.fixture(scope="session")
def fixture_pages(tmp_path_factory):
    """Deterministic fixture corpus (pages + expected), generated once."""
    from fixtures.gen import generate

    out = tmp_path_factory.mktemp("fixture_corpus")
    paths = generate(str(out), n_rows=400, seed=42)
    return paths
