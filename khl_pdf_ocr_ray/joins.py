"""Partition-count-safe Dataset.join wrapper.

Ray's hash-shuffle join builds each partition's table from the blocks it
receives; a partition that receives ZERO rows on one side becomes an empty
schema-less Arrow table and ``pa.Table.join`` fails with "No match ...
for key field reference" (join.py finalize has no schema fallback). That
happens whenever num_partitions exceeds the number of distinct keys on a
side — tiny pair tables, sparse graphs, skewed keys.

``safe_join`` sizes num_partitions from the smaller side's row count so
every partition is (overwhelmingly) populated: ``rows / 4096`` partitions,
capped at 4x the cluster's cores (more partitions than runnable tasks only
adds per-partition fixed cost), collapsing to a single partition for small
inputs. Both sides are materialized once — the join consumes each side
exactly once afterwards, so this is the single execution of each pipeline,
and the row count comes free from the materialized metadata (counting an
UN-materialized side would execute its pipeline a second time).

Empty-side semantics (callers otherwise crash or silently lose rows):
- either side empty + inner/left_semi  -> ``None`` (result is empty; an
  empty join output schema cannot be inferred here without executing the
  join — the caller supplies its own typed empty result);
- right side empty + left_anti/left outer -> the LEFT side unchanged
  (every left row survives an anti join against nothing);
- left side empty (any type) -> ``None``.
"""

from __future__ import annotations

from typing import Optional, Tuple

_ROWS_PER_PARTITION = 4096


def _max_partitions() -> int:
    """Partition ceiling: 4 tasks per core (below 16 never helps)."""
    import os

    ncpu = 0
    try:
        import ray

        if ray.is_initialized():
            ncpu = int(ray.cluster_resources().get("CPU", 0))
    except Exception:
        ncpu = 0
    ncpu = ncpu or (os.cpu_count() or 8)
    return max(16, 4 * ncpu)


def join_partitions(nbytes: int, per_partition_bytes: int = 32 << 20, lo: int = 8) -> int:
    """Join partition count sized from the (larger, pre-shuffle) side's
    input bytes — ~32 MB of shuffled input per partition, floored for toy
    scale and capped at 4 tasks per core. For streaming joins where
    materializing a side (as safe_join does) would add a barrier; callers
    pass the on-disk size of the dominant input (io.input_nbytes)."""
    return max(lo, min(_max_partitions(), int(nbytes) // per_partition_bytes))


def safe_join(
    left,
    right,
    on: Tuple[str, ...],
    right_on: Tuple[str, ...],
    join_type: str = "inner",
    rows_per_partition: int = _ROWS_PER_PARTITION,
):
    left = left.materialize()
    right = right.materialize()
    n_left, n_right = left.count(), right.count()
    if n_left == 0:
        return None
    if n_right == 0:
        # anti/outer joins against an empty right side keep every left row
        if join_type in ("left_anti", "left_outer", "full_outer"):
            return left
        return None
    n = min(n_left, n_right)
    num_partitions = max(1, min(_max_partitions(), n // rows_per_partition))
    return left.join(
        right,
        join_type=join_type,
        num_partitions=num_partitions,
        on=on,
        right_on=right_on,
    )
