"""XML sitemap source: synthesize -> parse -> per-source summary.

``sitemap_scan`` adds the XML container format to the source family
(parquet, JSONL, CSV master lists, KREC framed records): every source
publishes a deterministic sitemap XML document listing its URLs
(`<urlset><url><loc>...</loc><lastmod>...</lastmod></url>...`), one
source (SITEMAP_BROKEN) publishes a TRUNCATED document, and the scan
stage parses each sitemap with the stdlib ElementTree parser inside the
map task, emitting a per-source summary row — parse failures surface as
in-band ok=false rows (the reference error-row convention, app.py's
corrupt-PDF path).

What the oracle certifies: the SQL twin recomputes the EXPECTED summary
directly from the documents table (url and lastmod are pure functions
of doc_id; the broken source is a fixed rule) with no XML anywhere — so
a hash match proves the synthesize -> serialize -> parse -> summarize
roundtrip is lossless, which is precisely the contract of a source
format.

Plan / 100 TB notes: sitemap synthesis is a per-source map_groups fold
(source-cardinality groups; real deployments READ sitemaps, they don't
build them — the build here is the test harness half); the parse stage
is map-only over (source, xml) rows with the payload dropped in the
task; the summary is a |sources|-row table. A 50k-URL real sitemap is
~5 MB of XML per row — the batch sizing note for binary payloads
applies (small batches, payload never leaves the parse task).

Reference analogue: app.py:44 fetches one document per request;
brief scope (source/sink family, S1-S5 generalization).
"""

from __future__ import annotations

import xml.etree.ElementTree as ET

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

from ..remote import remote_fn

_QSM = "khl_pdf_ocr_ray.pipelines.queries_sitemap"

SITEMAP_BROKEN = "src7"  # this source's sitemap is truncated mid-entry
_NS = "http://www.sitemaps.org/schemas/sitemap/0.9"


def sitemap_url(source: str, doc_id: int) -> str:
    return f"https://{source}.example.org/doc/{doc_id}"


def sitemap_lastmod_day(doc_id: int) -> int:
    return 1 + doc_id % 28


def sitemap_build_group(g: pd.DataFrame) -> pd.DataFrame:
    """One source's doc rows -> one (source, xml) sitemap row (sorted
    by doc_id so the serialized bytes are deterministic)."""
    source = str(g["source"].iloc[0])
    parts = [f'<?xml version="1.0" encoding="UTF-8"?>\n<urlset xmlns="{_NS}">']
    for did in sorted(int(x) for x in g["doc_id"]):
        parts.append(
            "<url>"
            f"<loc>{sitemap_url(source, did)}</loc>"
            f"<lastmod>2024-01-{sitemap_lastmod_day(did):02d}</lastmod>"
            "</url>"
        )
    parts.append("</urlset>")
    xml = "\n".join(parts)
    if source == SITEMAP_BROKEN:
        xml = xml[: len(xml) // 2]  # planted truncation (unclosed tags)
    return pd.DataFrame({"source": [source], "xml": [xml]})


def sitemap_parse_batch(batch: pa.Table) -> pa.Table:
    """(source, xml) rows -> per-source summary rows via a REAL XML
    parse (ElementTree); parse failure -> in-band ok=false row with
    sentinel values. The XML payload dies in this task."""
    out = {
        "source": [],
        "n_urls": [],
        "min_day": [],
        "max_day": [],
        "ok": [],
    }
    for source, xml in zip(
        batch["source"].to_pylist(), batch["xml"].to_pylist()
    ):
        try:
            root = ET.fromstring(xml)
            days = []
            n = 0
            for url_el in root.findall(f"{{{_NS}}}url"):
                loc = url_el.findtext(f"{{{_NS}}}loc") or ""
                lastmod = url_el.findtext(f"{{{_NS}}}lastmod") or ""
                assert loc.startswith("https://"), loc
                days.append(int(lastmod.rsplit("-", 1)[1]))
                n += 1
            out["source"].append(source)
            out["n_urls"].append(n)
            out["min_day"].append(min(days) if days else -1)
            out["max_day"].append(max(days) if days else -1)
            out["ok"].append(True)
        except ET.ParseError:
            out["source"].append(source)
            out["n_urls"].append(0)
            out["min_day"].append(-1)
            out["max_day"].append(-1)
            out["ok"].append(False)
    return pa.table(
        {
            "source": pa.array(out["source"], pa.string()),
            "n_urls": pa.array(out["n_urls"], pa.int64()),
            "min_day": pa.array(out["min_day"], pa.int64()),
            "max_day": pa.array(out["max_day"], pa.int64()),
            "ok": pa.array(out["ok"], pa.bool_()),
        }
    )


def q_sitemap_scan(sf_dir: str) -> rd.Dataset:
    """(source, n_urls, min_day, max_day, ok) per source."""
    from .queries import _t

    return (
        _t(sf_dir, "documents", ["doc_id", "source"])
        .groupby("source")
        .map_groups(
            remote_fn(_QSM, "sitemap_build_group"), batch_format="pandas"
        )
        .map_batches(
            remote_fn(_QSM, "sitemap_parse_batch"),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
    )


SQL_SITEMAP_SCAN = f"""
SELECT source,
       CAST(CASE WHEN source = '{SITEMAP_BROKEN}' THEN 0
            ELSE count(*) END AS BIGINT) AS n_urls,
       CAST(CASE WHEN source = '{SITEMAP_BROKEN}' THEN -1
            ELSE min(1 + doc_id % 28) END AS BIGINT) AS min_day,
       CAST(CASE WHEN source = '{SITEMAP_BROKEN}' THEN -1
            ELSE max(1 + doc_id % 28) END AS BIGINT) AS max_day,
       source != '{SITEMAP_BROKEN}' AS ok
FROM documents GROUP BY source
"""


SITEMAP_QUERIES = {"sitemap_scan": q_sitemap_scan}
SITEMAP_ORACLES = {"sitemap_scan": SQL_SITEMAP_SCAN}
