"""Arrow batch-kernel helpers shared by per-batch combiners."""

from __future__ import annotations

import pyarrow as pa


def select_rename(t: pa.Table, **out_to_src: str) -> pa.Table:
    """Project + rename a table's columns BY NAME (never positionally).

    pyarrow's ``group_by().aggregate()`` emits key and aggregate columns
    in an order that has differed across pyarrow major versions, so a
    positional ``rename_columns`` after an aggregate silently swaps
    key/value columns on an unpinned upgrade. Keyword ORDER fixes the
    output column order; each keyword's VALUE names the source column
    (pyarrow names aggregates ``{col}_{fn}``). Zero-copy — the output
    table references the input's chunked arrays.
    """
    return pa.table({out: t[src] for out, src in out_to_src.items()})
