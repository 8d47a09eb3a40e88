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
- right side empty + left_anti -> the LEFT side unchanged (every left
  row survives an anti join against nothing);
- an OUTER join with an empty side raises NotImplementedError: the
  correct result needs the empty side's columns null-filled, which this
  wrapper cannot synthesize without a typed schema — silent column loss
  would be worse than a loud error (current outer-join callers guarantee
  both sides non-empty by construction).

Caveat (documented, not solved here): num_partitions derives from the
smaller side's ROW count, but the empty-partition hazard is governed by
DISTINCT-KEY count. Callers joining on a LOW-cardinality key (fewer
distinct keys than rows/4096) must pass ``num_partitions`` explicitly.
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
    num_partitions: Optional[int] = None,
):
    left = left.materialize()
    right = right.materialize()
    n_left, n_right = left.count(), right.count()
    if (n_left == 0 or n_right == 0) and join_type in ("left_outer", "full_outer"):
        # returning the non-empty side would silently DROP the other
        # side's columns (left_outer) or rows (full_outer)
        raise NotImplementedError(
            f"safe_join cannot synthesize the null-filled columns an "
            f"empty-side {join_type} needs; guarantee both sides non-empty "
            f"or handle the empty case at the call site"
        )
    if n_left == 0:
        return None
    if n_right == 0:
        # anti join against an empty right side keeps every left row
        if join_type == "left_anti":
            return left
        return None
    if num_partitions is None:
        n_small, n_large = min(n_left, n_right), max(n_left, n_right)
        # floor: the smaller side's row count keeps every partition
        # (overwhelmingly) populated; bump: a much LARGER probe side may
        # raise parallelism — one partition per ~100k probe rows — but
        # never past ~256 expected build rows per partition (the
        # empty-partition guard) or the 4x-cores cap (joins hang well
        # above ~8x cores in local mode). Without the bump a 12k x 3M
        # join funnels the whole probe side through 2 tasks (measured 3x
        # slower on substring_dup_spans before it passed this explicitly).
        num_partitions = max(
            1,
            min(
                _max_partitions(),
                max(
                    n_small // rows_per_partition,
                    min(n_large // 100_000, n_small // 256),
                ),
            ),
        )
    return left.join(
        right,
        join_type=join_type,
        num_partitions=num_partitions,
        on=on,
        right_on=right_on,
    )
