"""Cluster-size-derived tuning knobs.

One place for the partition-count rule every wide stage shares, so a
bigger cluster automatically gets more partitions (the round-2 code
carried per-module literal 16s tuned to the 32-vCPU sandbox — correct
there, a throttle on a 512-CPU cluster).

The rule: ``ncpu // 2`` partitions, floored at 2. Half the CPUs keeps
headroom for the read/write tasks that run concurrently with a join's
partition tasks, and stays strictly below cluster CPUs — Ray's hash
``Dataset.join`` deadlocks when ``num_partitions`` exceeds available
CPUs (observed: 32 partitions hang a 4-CPU pytest session; see
CLAUDE.md). No upper cap: on this sandbox the value is the same 16 the
literals encoded; on a 512-CPU cluster it becomes 256.

``small_cap`` bounds partition counts for stages whose input is known
tiny (driver fast paths) — pass it explicitly where it applies rather
than baking a global cap.
"""

from __future__ import annotations

__all__ = ["scale_partitions"]


def _ncpu() -> int:
    import ray

    try:
        return int(ray.cluster_resources().get("CPU", 8)) if \
            ray.is_initialized() else 8
    except Exception:
        return 8


def scale_partitions(*, cap: int | None = None, floor: int = 2) -> int:
    """Join-safe hash-partition count derived from cluster CPUs."""
    n = max(floor, _ncpu() // 2)
    return min(cap, n) if cap is not None else n


def read_parallelism() -> int:
    """``override_num_blocks`` for SINGLE-FILE table reads feeding a
    per-row kernel: one block per CPU. Ray's default splits a small
    file into ~2 blocks per CPU slot of under-100-row blocks whose
    per-block scheduling overhead dominates the kernel work (measured:
    ~1.5 s of a 3 s pipeline at 5k rows / 32 CPUs). Real deployments
    read many shard files and get natural file-level parallelism —
    this knob only matters for the one-file synthetic tables."""
    return max(8, _ncpu())
