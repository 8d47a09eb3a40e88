"""Partition-count-safe Dataset.join wrapper.

Ray's hash-shuffle join builds each partition's table from the blocks it
receives; a partition that receives ZERO rows on one side becomes an empty
schema-less Arrow table and ``pa.Table.join`` fails with "No match ...
for key field reference" (join.py finalize has no schema fallback). That
happens whenever num_partitions exceeds the number of distinct keys on a
side — tiny pair tables, sparse graphs, skewed keys.

``safe_join`` sizes num_partitions from the smaller side's row count so
every partition is (overwhelmingly) populated, collapsing to a single
partition for small inputs: correct at any scale, and at large scale the
count-based sizing converges to the fixed fan-out a static setting would
pick. Returns None when either side is empty — the caller supplies its
own typed empty result (an empty join output schema cannot be inferred
here without executing the join).
"""

from __future__ import annotations

from typing import Optional, Tuple


def safe_join(
    left,
    right,
    on: Tuple[str, ...],
    right_on: Tuple[str, ...],
    join_type: str = "inner",
    rows_per_partition: int = 4096,
    max_partitions: int = 16,
):
    left = left.materialize()
    right = right.materialize()
    n = min(left.count(), right.count())
    if n == 0:
        return None
    num_partitions = max(1, min(max_partitions, n // rows_per_partition))
    return left.join(
        right,
        join_type=join_type,
        num_partitions=num_partitions,
        on=on,
        right_on=right_on,
    )
