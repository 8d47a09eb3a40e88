"""Parquet footer audit: the table-format metadata surface.

``parquet_meta_stats``: per (table, column) — row-group count, value
count, compressed/uncompressed byte footprints and null counts read from
the parquet FOOTERS alone (no data pages touched). This is the statistics
surface a 100 TB engine's planner prunes with: which columns dominate
storage, which compress poorly, where nulls concentrate — and the audit
that catches a writer that silently stopped collecting stats.

Plan / 100 TB notes: the file list (here: the ten driver tables; at
deployment: every fragment of every dataset, listed from the store) fans
out as a Dataset of paths; each map task opens ONLY the thrift footer
(``pq.ParquetFile(path).metadata`` — a few KB per file regardless of data
size) and emits file-local per-column rows; one slim groupby folds
row-group partials across files. Footer reads are embarrassingly
parallel; nothing data-sized moves.

Oracle: DuckDB's own ``parquet_metadata()`` table function over the same
files — a fully INDEPENDENT footer decoder (duckdb's thrift reader vs
pyarrow's), aggregated by the same keys; byte-for-byte equality verified
for sizes, counts and null statistics.

Reference analogue: /root/reference/app.py has no storage surface (HTTP
per-doc service); brief scope (prune-at-the-read engineering).
"""

from __future__ import annotations

import os

import pyarrow as pa

from ..remote import remote_fn

_QM = "khl_pdf_ocr_ray.pipelines.queries_meta"

META_TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def footer_scan_batch(batch: pa.Table) -> pa.Table:
    """(tbl, path) rows -> per-column footer-stat rows (footer-only read)."""
    import pyarrow.parquet as pq

    out = {
        "tbl": [],
        "col": [],
        "n_groups": [],
        "n_values": [],
        "comp_bytes": [],
        "uncomp_bytes": [],
        "null_count": [],
    }
    for tbl, path in zip(batch["tbl"].to_pylist(), batch["path"].to_pylist()):
        md = pq.ParquetFile(path).metadata
        agg: dict = {}
        for rg in range(md.num_row_groups):
            g = md.row_group(rg)
            for ci in range(g.num_columns):
                c = g.column(ci)
                a = agg.setdefault(c.path_in_schema, [0, 0, 0, 0, 0])
                a[0] += 1
                a[1] += c.num_values
                a[2] += c.total_compressed_size
                a[3] += c.total_uncompressed_size
                st = c.statistics
                a[4] += st.null_count if st is not None and st.has_null_count else 0
        for col, a in agg.items():
            out["tbl"].append(tbl)
            out["col"].append(col)
            out["n_groups"].append(a[0])
            out["n_values"].append(a[1])
            out["comp_bytes"].append(a[2])
            out["uncomp_bytes"].append(a[3])
            out["null_count"].append(a[4])
    return pa.table(
        {
            "tbl": pa.array(out["tbl"], pa.string()),
            "col": pa.array(out["col"], pa.string()),
            "n_groups": pa.array(out["n_groups"], pa.int64()),
            "n_values": pa.array(out["n_values"], pa.int64()),
            "comp_bytes": pa.array(out["comp_bytes"], pa.int64()),
            "uncomp_bytes": pa.array(out["uncomp_bytes"], pa.int64()),
            "null_count": pa.array(out["null_count"], pa.int64()),
        }
    )


def q_parquet_meta_stats(sf_dir: str) -> "object":
    """(tbl, col, n_groups, n_values, comp_bytes, uncomp_bytes, null_count)."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    paths = pa.table(
        {
            "tbl": pa.array(META_TABLES, pa.string()),
            "path": pa.array(
                [os.path.join(sf_dir, f"{t}.parquet") for t in META_TABLES],
                pa.string(),
            ),
        }
    )
    per_file = rd.from_arrow(paths).map_batches(
        remote_fn(_QM, "footer_scan_batch"),
        batch_format="pyarrow",
        batch_size=2,  # a few footers per task: the fan-out unit is the FILE
    )
    # fold file-local partials (single-file tables here; many files at scale)
    return per_file.groupby(["tbl", "col"]).aggregate(
        Sum("n_groups", alias_name="n_groups"),
        Sum("n_values", alias_name="n_values"),
        Sum("comp_bytes", alias_name="comp_bytes"),
        Sum("uncomp_bytes", alias_name="uncomp_bytes"),
        Sum("null_count", alias_name="null_count"),
    )


def meta_oracle_sqls(sf_dir: str) -> dict:
    """sf-dir-parameterized SQL: duckdb's independent footer decoder."""
    legs = [
        f"""
SELECT '{t}' AS tbl,
       -- duckdb joins nested paths with ', '; pyarrow uses '.' — normalize
       replace(path_in_schema, ', ', '.') AS col,
       CAST(count(*) AS BIGINT) AS n_groups,
       CAST(sum(num_values) AS BIGINT) AS n_values,
       CAST(sum(total_compressed_size) AS BIGINT) AS comp_bytes,
       CAST(sum(total_uncompressed_size) AS BIGINT) AS uncomp_bytes,
       CAST(coalesce(sum(stats_null_count), 0) AS BIGINT) AS null_count
FROM parquet_metadata('{os.path.join(sf_dir, t + ".parquet")}')
GROUP BY path_in_schema"""
        for t in META_TABLES
    ]
    return {"parquet_meta_stats": "\nUNION ALL\n".join(legs)}


META_QUERIES = {"parquet_meta_stats": q_parquet_meta_stats}
