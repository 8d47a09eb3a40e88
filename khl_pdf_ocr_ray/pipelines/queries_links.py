"""Link-graph + page-metadata extraction queries over the pages corpus.

The outgoing-edge surface of the extraction tier (functions/links.py):
the reference extracts one document's content (/root/reference/app.py:
86-117); at web scale the SAME parse must also emit the page's hyperlink
rows (href, anchor text, structural container) and its metadata header
(title, paragraph/link counts) — the inputs to mirror detection, anchor-
text corpora and host ranking.

Three queries, all checked against sequential dump twins built by the
SAME kernels (state/oracle_dump_links.py):

- ``html_links``      — exploded (url, link_id, href, anchor, container)
                        rows, map-only; HTML pages only (PDF/WBOX payloads
                        carry no markup and emit nothing).
- ``html_link_degree``— in-degree of every link TARGET: total anchors and
                        distinct referring pages. Two slim exchanges
                        ((href, url) pre-collapse, then href rollup) so a
                        site-wide boilerplate link never forms a giant
                        group anywhere.
- ``html_meta``       — per-page (title, n_paras, n_links, footer_year),
                        map-only.

100 TB notes: link rows are slim strings (the html payload is dropped at
the parse task); the degree rollup's first exchange is keyed by
(href, url) — cardinality <= link rows, collapsing map-side per batch —
and the second by href alone over already-collapsed rows.
"""

from __future__ import annotations

import pyarrow as pa

import ray.data as rd
from ray.data.aggregate import Count, Sum

from ..functions.arrowkit import select_rename
from ..remote import remote_fn

_QL = "khl_pdf_ocr_ray.pipelines.queries_links"

from .queries_extract import _REPEAT  # noqa: E402  (the ONE repeat constant)


def _pages(sf_dir: str) -> rd.Dataset:
    from .extract_pipeline import synthesize_pages

    pages_dir = synthesize_pages(sf_dir, repeat=_REPEAT)
    return rd.read_parquet(pages_dir, columns=["url", "html"])


def links_explode(batch: pa.Table) -> pa.Table:
    """One row per <a> tag of every HTML page; payload never leaves."""
    from ..functions.links import extract_links
    from ..sources.wordbox import sniff_content_type

    urls, lids, hrefs, anchors, containers = [], [], [], [], []
    for url, payload in zip(batch["url"].to_pylist(), batch["html"].to_pylist()):
        if sniff_content_type(payload) != "text/html":
            continue
        for lid, href, anchor, container in extract_links(payload):
            urls.append(url)
            lids.append(lid)
            hrefs.append(href)
            anchors.append(anchor)
            containers.append(container)
    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "link_id": pa.array(lids, pa.int64()),
            "href": pa.array(hrefs, pa.string()),
            "anchor": pa.array(anchors, pa.string()),
            "container": pa.array(containers, pa.string()),
        }
    )


def meta_explode(batch: pa.Table) -> pa.Table:
    """One row per HTML page: (url, title, n_paras, n_links, footer_year)."""
    from ..functions.links import extract_meta
    from ..sources.wordbox import sniff_content_type

    urls, titles, nps, nls, yrs = [], [], [], [], []
    for url, payload in zip(batch["url"].to_pylist(), batch["html"].to_pylist()):
        if sniff_content_type(payload) != "text/html":
            continue
        title, n_paras, n_links, year = extract_meta(payload)
        urls.append(url)
        titles.append(title)
        nps.append(n_paras)
        nls.append(n_links)
        yrs.append(year)
    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "title": pa.array(titles, pa.string()),
            "n_paras": pa.array(nps, pa.int64()),
            "n_links": pa.array(nls, pa.int64()),
            "footer_year": pa.array(yrs, pa.int64()),
        }
    )


def tables_explode(batch: pa.Table) -> pa.Table:
    """One row per table CELL of every HTML page (functions/htmltables):
    the markup twin of pdf_table_cells. Map-only; payload dropped."""
    from ..functions.htmltables import extract_html_tables
    from ..sources.wordbox import sniff_content_type

    urls, tids, rows_, cols_, hdrs, texts = [], [], [], [], [], []
    for url, payload in zip(batch["url"].to_pylist(), batch["html"].to_pylist()):
        if sniff_content_type(payload) != "text/html":
            continue
        for tid, row, col, is_header, text in extract_html_tables(payload):
            urls.append(url)
            tids.append(tid)
            rows_.append(row)
            cols_.append(col)
            hdrs.append(is_header)
            texts.append(text)
    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "table_idx": pa.array(tids, pa.int64()),
            "row": pa.array(rows_, pa.int64()),
            "col": pa.array(cols_, pa.int64()),
            "is_header": pa.array(hdrs, pa.bool_()),
            "text": pa.array(texts, pa.string()),
        }
    )


def q_html_table_cells(sf_dir: str) -> rd.Dataset:
    return _pages(sf_dir).map_batches(
        remote_fn(_QL, "tables_explode"), batch_format="pyarrow"
    )


def degree_partial(batch: pa.Table) -> pa.Table:
    """Per-batch (href, url) pre-collapse. A page's link rows may split
    across combiner batches, so this is a partial for the (href, url)
    groupby, NOT for the final href rollup — exactness does not depend on
    page-to-batch alignment."""
    g = batch.group_by(["href", "url"]).aggregate([("link_id", "count")])
    return select_rename(g, href="href", url="url", n_refs="link_id_count")


def q_html_links(sf_dir: str) -> rd.Dataset:
    return _pages(sf_dir).map_batches(
        remote_fn(_QL, "links_explode"), batch_format="pyarrow"
    )


def q_html_link_degree(sf_dir: str) -> rd.Dataset:
    per_page = (
        _pages(sf_dir)
        .map_batches(remote_fn(_QL, "links_explode"), batch_format="pyarrow")
        .map_batches(
            remote_fn(_QL, "degree_partial"),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .groupby(["href", "url"])
        .aggregate(Sum("n_refs", alias_name="n_refs"))
    )
    return per_page.groupby("href").aggregate(
        Sum("n_refs", alias_name="n_refs"),
        Count(alias_name="n_pages"),
    )


def q_html_meta(sf_dir: str) -> rd.Dataset:
    return _pages(sf_dir).map_batches(
        remote_fn(_QL, "meta_explode"), batch_format="pyarrow"
    )


def anchor_pair_partial(batch: pa.Table) -> pa.Table:
    """Per-batch (href, anchor, n) collapse — partial for the pair
    groupby, so page-to-batch alignment never matters."""
    g = batch.group_by(["href", "anchor"]).aggregate([("link_id", "count")])
    return select_rename(g, href="href", anchor="anchor", n="link_id_count")


def anchor_rollup(g) -> "object":
    """One row per link target: its anchor-text vocabulary. The '|' join
    separator must not occur in anchors (they are whitespace-normalized
    words) — assert loudly rather than hash-mismatch silently."""
    import pandas as pd

    assert not g["anchor"].str.contains("|", regex=False).any()
    srt = g.sort_values(["n", "anchor"], ascending=[False, True])
    alpha = sorted(g["anchor"].tolist())
    return pd.DataFrame(
        {
            "href": [g["href"].iloc[0]],
            "n_anchors": pd.array([len(g)], dtype="int64"),
            "n_refs": pd.array([int(g["n"].sum())], dtype="int64"),
            "anchor_texts": ["|".join(alpha)],
            "top_anchor": [srt["anchor"].iloc[0]],
        }
    )


def q_anchor_text_agg(sf_dir: str) -> rd.Dataset:
    """Anchor-text corpus per link TARGET (the classic web-search /
    LLM-pretraining signal: what the web calls a page): distinct anchor
    count, total references, the alphabetical anchor vocabulary, and the
    most frequent anchor (ties to the lexicographically smallest).

    Plan: link explode (map-only, payload dropped) -> per-batch
    (href, anchor) collapse -> pair-keyed Sum -> per-href assembly over
    the ALREADY-COLLAPSED pair rows (groups are anchor-vocabulary-sized,
    never reference-count-sized — a boilerplate 'home' link referenced
    from every page of a site arrives as one row per distinct anchor)."""
    pairs = (
        _pages(sf_dir)
        .map_batches(remote_fn(_QL, "links_explode"), batch_format="pyarrow")
        .map_batches(
            remote_fn(_QL, "anchor_pair_partial"),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .groupby(["href", "anchor"])
        .aggregate(Sum("n", alias_name="n"))
    )
    return pairs.groupby("href").map_groups(
        remote_fn(_QL, "anchor_rollup"), batch_format="pandas"
    )


def block_stats_partial(batch: pa.Table) -> pa.Table:
    """HTML pages -> per-host boilerplate-strip accounting partials:
    (host, n_pages, n_blocks, n_kept, kept_chars, dropped_chars). Runs
    the SAME block scorer the extraction tier ships
    (functions/html_extract.extract_main_content — text/link-density
    keep rule), so this is the extraction headline's own yield report:
    how much of each host's markup survives the strip."""
    from ..functions.graph import host_of
    from ..functions.html_extract import extract_main_content
    from ..sources.wordbox import sniff_content_type

    cells: dict = {}
    for url, payload in zip(
        batch["url"].to_pylist(), batch["html"].to_pylist()
    ):
        if sniff_content_type(payload) != "text/html":
            continue
        blocks = extract_main_content(payload)["blocks"]
        c = cells.setdefault(host_of(url), [0, 0, 0, 0, 0])
        c[0] += 1
        for b in blocks:
            c[1] += 1
            if b["kept"]:
                c[2] += 1
                c[3] += len(b["text"])
            else:
                c[4] += len(b["text"])
    hosts = sorted(cells)
    return pa.table(
        {
            "host": pa.array(hosts, pa.string()),
            "n_pages": pa.array([cells[h][0] for h in hosts], pa.int64()),
            "n_blocks": pa.array([cells[h][1] for h in hosts], pa.int64()),
            "n_kept": pa.array([cells[h][2] for h in hosts], pa.int64()),
            "kept_chars": pa.array([cells[h][3] for h in hosts], pa.int64()),
            "dropped_chars": pa.array(
                [cells[h][4] for h in hosts], pa.int64()
            ),
        }
    )


def q_html_block_stats(sf_dir: str) -> rd.Dataset:
    """(host, n_pages, n_blocks, n_kept, kept_chars, dropped_chars) —
    the boilerplate-strip yield report per host. Map-only scoring (the
    payload never leaves the parse task) + ONE host-cardinality Sum."""
    return (
        _pages(sf_dir)
        .map_batches(
            remote_fn(_QL, "block_stats_partial"),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .groupby("host")
        .aggregate(
            Sum("n_pages", alias_name="n_pages"),
            Sum("n_blocks", alias_name="n_blocks"),
            Sum("n_kept", alias_name="n_kept"),
            Sum("kept_chars", alias_name="kept_chars"),
            Sum("dropped_chars", alias_name="dropped_chars"),
        )
    )


LINKS_QUERIES = {
    "html_links": q_html_links,
    "html_link_degree": q_html_link_degree,
    "html_meta": q_html_meta,
    "html_table_cells": q_html_table_cells,
    "anchor_text_agg": q_anchor_text_agg,
    "html_block_stats": q_html_block_stats,
}
