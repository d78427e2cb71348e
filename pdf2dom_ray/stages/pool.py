"""Actor-pool sizing helper.

A fixed actor pool that reserves every cluster CPU starves the
AllToAll (groupby/sort) tasks downstream and can livelock a pipeline
that mixes actor stages with shuffles. Default policy: autoscaling
``(1, ceil(cpus/4))`` per stateful stage so the streaming executor can
always reclaim CPUs for shuffle tasks, and multiple stateful stages in
one pipeline coexist.
"""

from __future__ import annotations

__all__ = ["default_pool"]


def default_pool(fraction: float = 0.25, floor: int = 2) -> tuple[int, int]:
    try:
        import ray
        ncpu = int(ray.cluster_resources().get("CPU", 8)) if \
            ray.is_initialized() else 8
    except Exception:
        ncpu = 8
    hi = max(floor, int(ncpu * fraction))
    return (1, hi)
