"""Crash-tolerant conformance soak runner.

Ray 2.49 has a probabilistic driver abort: the streaming executor's shutdown
task-cancellation can hit ``Check failed: it->second.submitted_task_ref_count
> 0`` in ``ReferenceCounter::RemoveSubmittedTaskReferences`` (observed
2026-08-19, full stack in BASELINE.md), which kills the pytest process with
NO test failure — the test that was running was not wrong, the engine died
under it. A single-process 25-example soak therefore dies long before the
registry is covered.

This runner executes each conformance test in its OWN pytest process:

* a clean pass counts once;
* a REAL assertion failure prints pytest's FAILED report and is terminal
  (never retried — a conformance divergence must surface);
* a silent engine abort (nonzero exit with no "failed" in the summary) is
  retried up to ``--retries`` times, counting the abort separately.

Usage::

    python scripts/soak_conformance.py [--examples 25] [--retries 2] [-k filter]
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def collect(k: str | None) -> list[str]:
    cmd = [sys.executable, "-m", "pytest", "tests/test_property_conformance.py",
           "--collect-only", "-q"]
    if k:
        cmd += ["-k", k]
    out = subprocess.run(cmd, cwd=REPO, capture_output=True, text=True).stdout
    return [l.strip() for l in out.splitlines() if "::" in l]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--examples", type=int, default=25)
    ap.add_argument("--retries", type=int, default=2)
    ap.add_argument("-k", default=None)
    args = ap.parse_args()

    tests = collect(args.k)
    env = dict(os.environ, CONF_MAX_EXAMPLES=str(args.examples))
    passed, failed, aborts = 0, [], 0
    t0 = time.time()
    for i, tid in enumerate(tests):
        for attempt in range(args.retries + 1):
            r = subprocess.run(
                [sys.executable, "-m", "pytest", tid, "-q", "--no-header"],
                cwd=REPO, env=env, capture_output=True, text=True, timeout=1800,
            )
            tail = (r.stdout or "")[-2000:]
            if r.returncode == 0:
                passed += 1
                break
            if "failed" in tail:  # real conformance failure: terminal
                failed.append(tid)
                print(f"FAILED {tid}\n{tail}", flush=True)
                break
            aborts += 1  # silent engine abort: retry
            print(f"ENGINE-ABORT (attempt {attempt + 1}) {tid}", flush=True)
        else:
            failed.append(tid + " [aborted every attempt]")
        if (i + 1) % 20 == 0:
            print(f"[{i + 1}/{len(tests)}] passed={passed} failed={len(failed)} "
                  f"engine_aborts={aborts} ({time.time() - t0:.0f}s)", flush=True)
    print(f"SOAK DONE: {passed}/{len(tests)} passed, {len(failed)} failed, "
          f"{aborts} engine aborts, {time.time() - t0:.0f}s", flush=True)
    for f in failed:
        print("  FAILED:", f)
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
