"""Sequential-oracle dumps for the link-graph extraction queries
(pipelines/queries_links.py): ``html_links``, ``html_link_degree``,
``html_meta``.

Same method as the other dump families: a single-process run of the SAME
per-page kernels over the whole pages corpus, with the degree rollup done
by DuckDB over the exploded rows (count / count distinct — an independent
path from the distributed two-level combiner). Separate cache key (this
module + functions/links.py + queries_links.py + the synthesized pages
corpus) so link-parser edits never rebuild the extract/near-dup dumps.
"""

from __future__ import annotations

import hashlib
import os
from typing import Dict

import pyarrow as pa
import pyarrow.parquet as pq

from .atomic import ensure_published


def dumps_dir(sf_dir: str) -> str:
    from ..pipelines.extract_pipeline import synthesize_pages
    from ..pipelines.queries_extract import _REPEAT

    pages_dir = synthesize_pages(sf_dir, repeat=_REPEAT)
    pkg = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    parts = []
    for rel in (
        "functions/links.py",
        "functions/html_extract.py",  # block-scoring kernel (block stats)
        "functions/htmltables.py",  # table-cell kernel
        "pipelines/queries_links.py",
        "state/oracle_dump_links.py",
        "sources/synth.py",  # pages-corpus generator
    ):
        with open(os.path.join(pkg, rel), "rb") as f:
            parts.append(hashlib.md5(f.read()).hexdigest())
    key = hashlib.sha256(
        f"{pages_dir}:{':'.join(parts)}:v1".encode()
    ).hexdigest()[:16]
    return os.path.join("/tmp/khlray_cache", f"oracle_dumps_links_{key}")


def _build_dumps(sf_dir: str, tmp_dir: str) -> None:
    from ..pipelines.extract_pipeline import synthesize_pages
    from ..pipelines.queries_extract import _REPEAT
    from ..pipelines.queries_links import (
        links_explode,
        meta_explode,
        tables_explode,
    )

    os.makedirs(tmp_dir, exist_ok=True)
    pages_dir = synthesize_pages(sf_dir, repeat=_REPEAT)
    pages = pq.read_table(pages_dir, columns=["url", "html"])
    pq.write_table(
        links_explode(pages), os.path.join(tmp_dir, "links_seq.parquet")
    )
    pq.write_table(meta_explode(pages), os.path.join(tmp_dir, "meta_seq.parquet"))
    pq.write_table(
        tables_explode(pages), os.path.join(tmp_dir, "tables_seq.parquet")
    )

    # per-host boilerplate-strip accounting: the same kernel, one process,
    # whole corpus in one batch (the per-host cells merge by construction)
    from ..pipelines.queries_links import block_stats_partial

    pq.write_table(
        block_stats_partial(pages),
        os.path.join(tmp_dir, "block_stats_seq.parquet"),
    )


def ensure_dumps(sf_dir: str) -> str:
    return ensure_published(dumps_dir(sf_dir), lambda tmp: _build_dumps(sf_dir, tmp))


def links_oracle_sqls(sf_dir: str) -> Dict[str, str]:
    d = ensure_dumps(sf_dir)

    def p(name: str) -> str:
        return os.path.join(d, name)

    return {
        "html_block_stats": (
            "SELECT host, n_pages, n_blocks, n_kept, kept_chars, "
            f"dropped_chars FROM read_parquet('{p('block_stats_seq.parquet')}')"
        ),
        "html_links": (
            "SELECT url, link_id, href, anchor, container "
            f"FROM read_parquet('{p('links_seq.parquet')}')"
        ),
        # independent rollup: DuckDB count / count(distinct) over the
        # exploded rows vs the engine's two-level combiner
        "html_link_degree": (
            "SELECT href, count(*) AS n_refs, count(DISTINCT url) AS n_pages "
            f"FROM read_parquet('{p('links_seq.parquet')}') GROUP BY href"
        ),
        "html_meta": (
            "SELECT url, title, n_paras, n_links, footer_year "
            f"FROM read_parquet('{p('meta_seq.parquet')}')"
        ),
        "html_table_cells": (
            "SELECT url, table_idx, row, col, is_header, text "
            f"FROM read_parquet('{p('tables_seq.parquet')}')"
        ),
        # independent rollup: window row_number + ordered string_agg in
        # DuckDB vs the engine's combiner + per-target assembly
        "anchor_text_agg": f"""
WITH pairs AS (
  SELECT href, anchor, CAST(count(*) AS BIGINT) AS n
  FROM read_parquet('{p('links_seq.parquet')}') GROUP BY href, anchor),
top AS (
  SELECT href, anchor AS top_anchor FROM (
    SELECT href, anchor,
           ROW_NUMBER() OVER (PARTITION BY href
                              ORDER BY n DESC, anchor) AS rn
    FROM pairs) WHERE rn = 1),
agg AS (
  SELECT href, CAST(count(*) AS BIGINT) AS n_anchors,
         CAST(sum(n) AS BIGINT) AS n_refs,
         string_agg(anchor, '|' ORDER BY anchor) AS anchor_texts
  FROM pairs GROUP BY href)
SELECT a.href, a.n_anchors, a.n_refs, a.anchor_texts, t.top_anchor
FROM agg a JOIN top t ON a.href = t.href
""",
    }
