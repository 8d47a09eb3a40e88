"""Metadata-clean parquet reads.

Parquet files written via pandas embed a b'pandas' dict in the Arrow
schema metadata. Ray hashes block schemas for deduplication in every
shuffle/split, and a schema carrying that dict is unhashable — each
affected task logs "Failed to hash the schemas" and loses schema-dedup.
Passing an explicit metadata-free schema to ``read_parquet`` fixes the
blocks at the source (zero extra operators); the schema is read from the
file footer driver-side (cheap) and projected to the requested columns.
"""

from __future__ import annotations

import glob
import os
from typing import List, Optional

import pyarrow as pa
import pyarrow.parquet as pq

import ray.data as rd


def _footer_schema(path) -> pa.Schema:
    if isinstance(path, (list, tuple)):  # before isdir: it raises on lists
        path = path[0]
    if os.path.isdir(path):
        # recursive: hive-partitioned layouts keep fragments in subdirs
        # (note the fragment footer does NOT carry hive partition columns
        # — read such dirs with plain read_parquet when those are needed)
        frags = sorted(
            glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True)
        )
        path = frags[0]
    return pq.read_schema(path).remove_metadata()


def read_parquet_clean(
    path, columns: Optional[List[str]] = None, **kwargs
) -> rd.Dataset:
    """``ray.data.read_parquet`` with a metadata-free explicit schema."""
    probe = path[0] if isinstance(path, (list, tuple)) else path
    full = _footer_schema(probe)
    schema = pa.schema([full.field(c) for c in columns]) if columns else full
    return rd.read_parquet(path, columns=columns, schema=schema, **kwargs)


def input_nbytes(path) -> int:
    """On-disk byte size of a parquet file/directory (cheap stat walk)."""
    if isinstance(path, (list, tuple)):
        return sum(input_nbytes(p) for p in path)
    if os.path.isdir(path):
        return sum(
            os.path.getsize(p)
            for p in glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True)
        )
    return os.path.getsize(path)


def table_nbytes(sf_dir: str, table: str) -> int:
    """On-disk byte size of one named test table under ``sf_dir`` — the
    sizing hint safe_join's streaming (barrier-free) path wants."""
    return input_nbytes(os.path.join(sf_dir, f"{table}.parquet"))


def input_nrows(path) -> int:
    """Exact row count from parquet FOOTERS only (no data read) — free
    like input_nbytes, for cardinality-aware reduce sizing."""
    import pyarrow.parquet as pq

    if isinstance(path, (list, tuple)):
        return sum(input_nrows(p) for p in path)
    if os.path.isdir(path):
        return sum(
            input_nrows(p)
            for p in glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True)
        )
    return pq.ParquetFile(path).metadata.num_rows


def table_nrows(sf_dir: str, table: str) -> int:
    return input_nrows(os.path.join(sf_dir, f"{table}.parquet"))


# Ray's sort-based aggregate walks group boundaries per key in Python, so
# a reduce task's cost scales with the KEYS it holds, not its bytes: a
# 110k-key rollup coalesced to 2 partitions measured 12 s of pure per-key
# overhead vs 2 s at 32 (sf0.1 lineitem->orderkey). Cap keys per reduce
# task; the byte-derived width still rules when blocks dominate.
_KEYS_PER_REDUCE = 4096


def coalesce_for_keys(nbytes: int, n_keys: int, **kw) -> int:
    """coalesce_for_input, widened so no reduce task owns more than
    ~_KEYS_PER_REDUCE distinct groups of a HIGH-CARDINALITY groupby
    (orderkey/custkey/user-keyed rollups). ``n_keys`` is an upper bound
    on distinct keys (e.g. the FK parent's footer row count — free)."""
    import ray

    try:
        ncpu = int(ray.cluster_resources().get("CPU", 0)) or (os.cpu_count() or 8)
    except Exception:
        ncpu = os.cpu_count() or 8
    by_keys = min(4 * ncpu, int(n_keys) // _KEYS_PER_REDUCE)
    return max(coalesce_for_input(nbytes, **kw), by_keys)


def blocks_for_bytes(
    nbytes: int, target_block_bytes: int = 32 << 20, lo: int = 8
) -> int:
    """Block count sized from DATA bytes, not a constant: ``nbytes /
    target_block_bytes`` with a floor for parallelism at toy scale and NO
    ceiling — a fixed ``repartition(8)`` on a growing intermediate becomes
    an all-to-all into 8 giant blocks at 100 TB, while byte-derived counts
    keep blocks at the object-store-friendly target size at any scale.
    Pass an ``expand`` factor via pre-multiplied nbytes when sizing an
    exploded intermediate (e.g. an inverted index ~10x its source text)."""
    return max(lo, int(nbytes) // target_block_bytes)


def coalesce_for_input(
    nbytes: int,
    fan_in: int = 16,
    lo: int = 2,
    target_block_bytes: int = 32 << 20,
) -> int:
    """Pre-groupby coalesce width for a per-block COMBINER output.

    A combiner emits ~group-cardinality rows PER BLOCK, so its total size
    grows with the input's block count; coalescing it to a literal 2
    creates two giant blocks at high block counts (same failure class as
    the fixed-repartition ceiling documented on blocks_for_bytes). One
    reduce partition per ``fan_in`` input blocks bounds each coalesced
    block at fan_in x cardinality rows at ANY scale, while the floor
    keeps every reduce partition non-empty at toy scale."""
    return max(lo, blocks_for_bytes(nbytes, target_block_bytes, lo=lo) // fan_in)


def blocks_for_rows(nrows: int, rows_per_block: int = 200_000, lo: int = 2) -> int:
    """Block count sized from row count (for slim fixed-width intermediates
    whose byte size is rows x ~24 B): no ceiling, floor for toy scale."""
    return max(lo, int(nrows) // rows_per_block)
