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
inputs.

Callers that KNOW both sides are non-empty (base tables, FK-backed
aggregates) pass ``assume_non_empty=True`` plus byte sizes (or an explicit
``num_partitions``) and get a fully STREAMING join: no materialization, no
pipeline barrier, nothing pinned in the object store — the 100 TB default.
The materialize+count path is the FALLBACK for data-dependent sides
(dedup pair sets, decontamination hits, filtered intermediates) where
emptiness must be detected to return the documented sentinel results; the
join consumes each side exactly once afterwards, so the materialization is
the single execution of each pipeline and its row count is free.

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


def partitions_for_rows(nrows: int, rows_per_partition: int = _ROWS_PER_PARTITION) -> int:
    """Join partition count from a FREE row count (materialized metadata,
    parquet footers): same sizing rule as safe_join's fallback, without
    the materialize. Collapses to 1 for small inputs — tiny dimension
    tables must not pay multi-partition exchange fixed costs."""
    return max(1, min(_max_partitions(), int(nrows) // rows_per_partition))


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
    left_nbytes: Optional[int] = None,
    right_nbytes: Optional[int] = None,
    assume_non_empty: bool = False,
):
    """See module docstring. Two execution regimes:

    STREAMING (no barrier): when the caller asserts ``assume_non_empty``
    (both sides structurally non-empty — base tables, FK-backed
    aggregates) AND supplies sizing (``num_partitions`` directly, or
    ``left_nbytes``/``right_nbytes`` from io.input_nbytes / upstream
    metadata), the join runs without materializing either side — no
    pipeline barrier, nothing pinned in the object store.

    FALLBACK (materialize + count): when emptiness is data-dependent
    (dedup pair sets, decontamination hits) or no sizing is known, both
    sides are materialized once — the join consumes each side exactly
    once afterwards, so this is the single execution of each pipeline,
    and the row count comes free from the materialized metadata.
    """
    if assume_non_empty and (
        num_partitions is not None or left_nbytes or right_nbytes
    ):
        if num_partitions is None:
            num_partitions = join_partitions(
                max(int(left_nbytes or 0), int(right_nbytes or 0))
            )
        return left.join(
            right,
            join_type=join_type,
            num_partitions=num_partitions,
            on=on,
            right_on=right_on,
        )
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


# --- skew-aware join ----------------------------------------------------------
def _key_count_partial(batch, key: str):
    """Per-batch (key, n) combiner for exact probe-side key counts."""
    from .functions.arrowkit import select_rename

    g = batch.select([key]).group_by([key]).aggregate([(key, "count")])
    return select_rename(g, k_=key, n_=f"{key}_count")


def _keep_keys(batch, key: str, keys, invert: bool):
    import pyarrow as pa
    import pyarrow.compute as pc

    mask = pc.is_in(batch[key], value_set=pa.array(keys))
    return batch.filter(pc.invert(mask) if invert else mask)


def _project(batch, cols):
    return batch.select(cols)


def _broadcast_join_batch(batch, key: str, right_key: str, build_ref, hot, schema):
    """Map-side hash join of one probe batch's HOT rows against the
    broadcast build slice; emits the fixed output schema so the union
    with the shuffle path is type-exact even for empty batches."""
    import pyarrow as pa
    import pyarrow.compute as pc

    import ray

    build = ray.get(build_ref)
    hot_rows = batch.filter(pc.is_in(batch[key], value_set=pa.array(hot))).to_pandas()
    cols = [f.name for f in schema]
    if hot_rows.empty:
        return pa.table({c: pa.array([], schema.field(c).type) for c in cols})
    merged = hot_rows.merge(build, left_on=key, right_on=right_key, how="inner")
    return pa.Table.from_pandas(merged[cols], schema=schema, preserve_index=False)


def skew_join(
    left,
    right,
    key: str,
    right_key: str,
    out_schema,
    hot_count_threshold: int = 100_000,
):
    """Skew-aware INNER join — the brief's "salt hot keys", realized as
    the standard split recipe: exact per-key probe counts via a map-side
    combiner, keys at/above ``hot_count_threshold`` join by BROADCASTING
    the build-side slice into a map-only stage, and the cold remainder
    goes through the normal hash-shuffle join — no shuffle partition ever
    holds a hot key's full probe row set.

    Partitioning assumptions (per the brief, documented):
    - the hot-key SET is bounded: at most count(left)/threshold keys
      reach the driver;
    - the BUILD side is dimension-like (bounded rows per key), so the
      broadcast slice is |hot| x per-key rows — the classic skew-join
      regime. A skewed-build x skewed-probe pair needs salting WITH
      build replication instead: that is ``salted_skew_join`` below
      (exercised by the skew_join_salted registry query).

    ``out_schema`` (pyarrow.Schema) fixes the output projection so the
    broadcast path and the shuffle path union with identical types.
    """
    import ray
    from ray.data.aggregate import Sum as _Sum

    from .remote import remote_fn

    left = left.materialize()
    counts = (
        left.map_batches(
            remote_fn("khl_pdf_ocr_ray.joins", "_key_count_partial", key=key),
            batch_format="pyarrow",
        )
        .groupby("k_")
        .aggregate(_Sum("n_", alias_name="n_"))
        .to_pandas()  # one row per distinct probe key — keys, never rows
    )
    hot = sorted(counts.loc[counts["n_"] >= hot_count_threshold, "k_"].tolist())
    cols = [f.name for f in out_schema]

    if not hot:
        j = safe_join(left, right, on=(key,), right_on=(right_key,))
        return None if j is None else j.map_batches(
            remote_fn("khl_pdf_ocr_ray.joins", "_project", cols=cols),
            batch_format="pyarrow",
        )

    right = right.materialize()  # consumed twice: hot slice + cold join
    build_hot = right.map_batches(
        remote_fn(
            "khl_pdf_ocr_ray.joins", "_keep_keys", key=right_key, keys=hot, invert=False
        ),
        batch_format="pyarrow",
    ).to_pandas()  # |hot| x per-key rows — the documented broadcast bound
    build_ref = ray.put(build_hot)

    hot_joined = left.map_batches(
        remote_fn(
            "khl_pdf_ocr_ray.joins",
            "_broadcast_join_batch",
            key=key,
            right_key=right_key,
            build_ref=build_ref,
            hot=hot,
            schema=out_schema,
        ),
        batch_format="pyarrow",
    )
    cold = left.map_batches(
        remote_fn("khl_pdf_ocr_ray.joins", "_keep_keys", key=key, keys=hot, invert=True),
        batch_format="pyarrow",
    )
    cold_joined = safe_join(cold, right, on=(key,), right_on=(right_key,))
    if cold_joined is None:  # every probe key was hot
        return hot_joined
    cold_joined = cold_joined.map_batches(
        remote_fn("khl_pdf_ocr_ray.joins", "_project", cols=cols),
        batch_format="pyarrow",
    )
    return hot_joined.union(cold_joined)


# --- salted skew join (two-sided skew) ----------------------------------------
def _salt_probe_batch(batch, key: str, hot, n_salt: int):
    """Append ``_salt``: hot-key probe rows spread over 0..n_salt-1 (any
    assignment is correct — the build side is replicated to EVERY salt, so
    the join's row multiset is salt-assignment-independent); cold rows 0."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    is_hot = pc.is_in(batch[key], value_set=pa.array(hot))
    spread = np.arange(batch.num_rows, dtype=np.int64) % n_salt
    salt = pc.if_else(is_hot, pa.array(spread), pa.scalar(0, pa.int64()))
    return batch.append_column("_salt", salt)


def _replicate_build_batch(batch, right_key: str, hot, n_salt: int):
    """Build side: cold rows pass through with ``_salt`` 0; hot-key rows
    are replicated n_salt times, one copy per salt value, so every salted
    probe partition sees the full build slice of its hot key."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    is_hot = pc.is_in(batch[right_key], value_set=pa.array(hot))
    cold = batch.filter(pc.invert(is_hot))
    cold = cold.append_column(
        "_salt_r", pa.array(np.zeros(cold.num_rows, dtype=np.int64))
    )
    hot_rows = batch.filter(is_hot)
    n = hot_rows.num_rows
    if n == 0:
        return cold
    rep = hot_rows.take(np.repeat(np.arange(n, dtype=np.int64), n_salt))
    salts = pa.array(np.tile(np.arange(n_salt, dtype=np.int64), n))
    return pa.concat_tables([cold, rep.append_column("_salt_r", salts)])


def salted_skew_join(
    left,
    right,
    key: str,
    right_key: str,
    out_schema,
    hot_count_threshold: int = 100_000,
    n_salt: int = 16,
    force: Optional[str] = None,
    num_partitions: Optional[int] = None,
):
    """INNER join for the SKEWED-BUILD x SKEWED-PROBE regime ``skew_join``
    documents but does not cover: when a hot key is heavy on BOTH sides,
    broadcasting its build slice (skew_join's move) re-creates the
    straggler in every map task's memory. Here the probe side's hot rows
    are SALTED over ``n_salt`` sub-keys and the build side's hot rows are
    REPLICATED once per salt, so the hot key's work spreads over n_salt
    shuffle partitions while each partition still sees the full build
    slice of its salt. Cold keys ride along with salt 0 on both sides —
    ONE hash join on (key, salt), no broadcast, no driver materialization
    of any data-sized state.

    Output rows are exactly the plain inner join's multiset: replication
    to every salt makes the result independent of the probe salt
    assignment (forced-branch equivalence test in tests/test_joins_skew).

    Partitioning assumptions (documented):
    - the hot-key SET is bounded (<= count(left)/threshold keys reach the
      driver via the same exact per-key combiner skew_join uses);
    - the build side's hot slice is replicated n_salt x through the
      shuffle — pick n_salt ~ (hot probe rows / target partition rows),
      NOT proportional to build size;
    - per-key join fan-out (n_probe x n_build rows) is the OUTPUT's
      inherent size; salting bounds per-task input, not output.

    ``force``: None (size-based), "plain" (skip salting), "salted"
    (salt even if no key crosses the threshold — test hook, mirrors the
    BFS forced-branch convention).
    """
    from ray.data.aggregate import Sum as _Sum

    from .remote import remote_fn

    assert force in (None, "plain", "salted")
    assert "_salt" not in [f.name for f in out_schema]
    cols = [f.name for f in out_schema]

    left = left.materialize()  # consumed twice: key counts + probe
    counts = (
        left.map_batches(
            remote_fn("khl_pdf_ocr_ray.joins", "_key_count_partial", key=key),
            batch_format="pyarrow",
        )
        .groupby("k_")
        .aggregate(_Sum("n_", alias_name="n_"))
        .to_pandas()  # one row per distinct probe key — keys, never rows
    )
    if force == "salted":
        hot = sorted(counts.nlargest(1, "n_")["k_"].tolist())
    elif force == "plain":
        hot = []
    else:
        hot = sorted(counts.loc[counts["n_"] >= hot_count_threshold, "k_"].tolist())

    if not hot:
        j = safe_join(left, right, on=(key,), right_on=(right_key,))
        return None if j is None else j.map_batches(
            remote_fn("khl_pdf_ocr_ray.joins", "_project", cols=cols),
            batch_format="pyarrow",
        )

    salted_left = left.map_batches(
        remote_fn(
            "khl_pdf_ocr_ray.joins", "_salt_probe_batch",
            key=key, hot=hot, n_salt=n_salt,
        ),
        batch_format="pyarrow",
    )
    replicated_right = right.map_batches(
        remote_fn(
            "khl_pdf_ocr_ray.joins", "_replicate_build_batch",
            right_key=right_key, hot=hot, n_salt=n_salt,
        ),
        batch_format="pyarrow",
    )
    j = safe_join(
        salted_left,
        replicated_right,
        on=(key, "_salt"),
        right_on=(right_key, "_salt_r"),
        num_partitions=num_partitions,
    )
    return None if j is None else j.map_batches(
        remote_fn("khl_pdf_ocr_ray.joins", "_project", cols=cols),
        batch_format="pyarrow",
    )
