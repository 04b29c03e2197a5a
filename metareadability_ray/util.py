"""Shared helpers."""

from __future__ import annotations


def auto_actor_concurrency(frac: float = 0.5, minimum: int = 1, cap: int | None = None) -> int:
    """Actor-pool size that always leaves CPU headroom for the task-based
    stages (read / shuffle / write) feeding the pool.

    An actor pool sized to every CPU deadlocks a small cluster: actors hold
    their CPU for the lifetime of the operator while upstream read tasks and
    downstream shuffle tasks wait for one. Half the CPUs (min 1) is safe at
    every size and measured fastest on this oversubscribed VM (bench.py).
    """
    try:
        import ray

        cpus = int(ray.available_resources().get("CPU", 4)) if ray.is_initialized() else 4
    except Exception:  # pragma: no cover - ray not importable
        cpus = 4
    c = max(minimum, int(cpus * frac))
    return min(c, cap) if cap is not None else c
