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


def _footer_schema(path: str) -> pa.Schema:
    if os.path.isdir(path):
        frags = sorted(glob.glob(os.path.join(path, "*.parquet")))
        path = frags[0]
    elif isinstance(path, (list, tuple)):
        path = path[0]
    return pq.read_schema(path).remove_metadata()


def read_parquet_clean(
    path, columns: Optional[List[str]] = None, **kwargs
) -> rd.Dataset:
    """``ray.data.read_parquet`` with a metadata-free explicit schema."""
    probe = path[0] if isinstance(path, (list, tuple)) else path
    full = _footer_schema(probe)
    schema = pa.schema([full.field(c) for c in columns]) if columns else full
    return rd.read_parquet(path, columns=columns, schema=schema, **kwargs)
