"""Shared fixtures. Ray is initialised ONCE per pytest session (SURVEY.md §5)."""

from __future__ import annotations

import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))


_CANCEL_PATCHED = {"done": False}


def _disable_dataset_task_cancellation():
    """Neutralize Ray Data's executor-shutdown task cancellation for the
    TEST process: Ray 2.49's cancel path races task completion in the
    driver's core worker and aborts the whole process on a C++ CHECK —
    observed twice on this repo's suite with two distinct signatures
    (`reference_count.cc:581 submitted_task_ref_count > 0` and
    `task_manager.cc:930 Tried to complete task that was not pending`),
    both immediately after "Cancelling a task …" lines (full stacks in
    BASELINE.md). Every `.limit()` query legitimately abandons in-flight
    upstream tasks at executor shutdown, so a long suite rolls this die
    hundreds of times.

    With `OpTask._cancel` a no-op, `_cancel_active_tasks` simply
    `ray.get`-waits for the (millisecond-scale, tiny-table) test tasks to
    finish naturally — semantics identical, no cancel RPC, no race.
    Production code paths are untouched: this runs only from tests/."""
    if _CANCEL_PATCHED["done"]:
        return
    from ray.data._internal.execution.interfaces.physical_operator import OpTask

    OpTask._cancel = lambda self, force: None
    _CANCEL_PATCHED["done"] = True


def _init_ray():
    import ray

    _disable_dataset_task_cancellation()
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

    DataContext.get_current().enable_progress_bars = False


@pytest.fixture(scope="session")
def ray_session():
    import ray

    if not ray.is_initialized():
        _init_ray()
    yield ray
    # Shut down in a bounded thread: a wedged cluster (leaked actor-pool
    # workers, see ray#53727-adjacent teardown failures) can hang
    # ray.shutdown() forever, which would swallow pytest's failure report.
    import threading

    t = threading.Thread(target=ray.shutdown, daemon=True)
    t.start()
    t.join(timeout=30)


_RAY_TESTS_SINCE_INIT = {"n": 0}
# Recycle the Ray session every N Ray-using tests. Ray 2.49's driver-side
# core worker segfaults in _raylet.so (null deref, constant offset c4f440)
# once a single local session has accumulated a few thousand distinct task
# specs (the raylet logs "More than 7xxx types of tasks seen" shortly
# before) — observed killing three full-suite runs at the ~220-test mark
# with the raylet then dying via parent-death SIGKILL and pytest's buffered
# output lost. One init per ~100 tests keeps each session far below that
# horizon while preserving the one-command suite; cross-test state is all
# driver-side (pa.Table memos, on-disk fixtures), so a restart is invisible
# to the tests themselves.
_RAY_RECYCLE_EVERY = max(8, 240 // int(__import__("os").environ.get("CONF_MAX_EXAMPLES", "8")))
# task specs accumulate per HYPOTHESIS EXAMPLE, not per test, so a 25-example
# soak ages the session ~3× faster than a default run — scale the recycle
# interval inversely with the example budget (8 ex → every 30 tests,
# 25 ex → every ~10). Tightened from 800// in r5: two full-suite runs
# wedged mid-conformance (a starved-session hang, not a crash — the
# cancel no-op turns the 2.49 shutdown crash into waiting) at ~70-80
# conformance tests into one session; every-30 keeps the conformance
# region to ≤ ~500 datasets per session at the cost of ~20 extra 5 s
# recycles per suite run.


@pytest.fixture(autouse=True)
def _release_actor_pools(request):
    """Break the reference cycles that keep completed datasets' actor-pool
    workers alive (each holds a CPU; enough leaks wedge the 4-CPU session),
    and recycle the Ray session before it ages into the 2.49 crash window."""
    yield
    import gc

    gc.collect()
    if "ray_session" in request.fixturenames:
        _RAY_TESTS_SINCE_INIT["n"] += 1
        if _RAY_TESTS_SINCE_INIT["n"] >= _RAY_RECYCLE_EVERY:
            _RAY_TESTS_SINCE_INIT["n"] = 0
            import ray

            ray.shutdown()
            _init_ray()


@pytest.fixture(scope="session")
def fixture_pages(tmp_path_factory):
    """Deterministic fixture corpus (pages + expected), generated once."""
    from fixtures.gen import generate

    out = tmp_path_factory.mktemp("fixture_corpus")
    paths = generate(str(out), n_rows=400, seed=42)
    return paths


@pytest.fixture
def fresh_ray_session():
    """A just-recycled Ray session for actor-pool-heavy smoke tests.

    Ray 2.49 leaks MapWorker actor handles per completed dataset; across
    many hypothesis examples the leaked workers can hold every CPU of the
    small test session and the NEXT dataset wedges forever (observed twice
    in r5: a 3-LSH-smoke pytest invocation and the full suite's smoke
    region, both stuck >20 min with zero progress). The between-test
    recycle can't help a test that starts on an already-aged session —
    these tests get a guaranteed-fresh one instead (~5 s each, ~25 tests)."""
    import gc

    import ray

    gc.collect()
    if ray.is_initialized():
        ray.shutdown()
    _init_ray()
    _RAY_TESTS_SINCE_INIT["n"] = 0
    yield ray
