"""Cross-document line units for C4-style line-level dedup.

C4/RefinedWeb-style corpora deduplicate at LINE granularity in addition to
document granularity: a line (here: one kept block of the boilerplate
stripper — the engine's newline unit, reference app.py extracts text
block-wise too) that occurs on many pages is boilerplate the density
scorer missed (nav strips, "related items" footers), and only its FIRST
occurrence corpus-wide survives. This module holds the line-identity
kernel shared by the distributed plan (pipelines/queries_extract.py) and
the sequential oracle dump (state/oracle_dump.py) — the shared-kernel
convention of the other dump-backed oracles: the kernel is held by unit
tests, the driver gate certifies the DISTRIBUTED part (explode, winner
aggregate, join-back, per-url reduce) against DuckDB's relational twin.

Line identity = md5 of the whitespace-collapsed block text
(case-sensitive — C4's exact-line match). First occurrence = the minimum
``pos_key`` string; both engines order by the identical packed key, so
the winner is well-defined even where the packed-string order deviates
from raw (url, block_id) tuple order (a url that is a strict prefix of
another).
"""

from __future__ import annotations

import hashlib
from typing import List, Tuple


def kept_line_rows(payload) -> List[Tuple[int, str, int]]:
    """(block_id, line_md5, n_chars) for every KEPT, non-empty block of an
    HTML page; [] for non-HTML payloads (PDF gamesheets are single-record
    documents — per-line frequency across them is not boilerplate signal).
    block_id matches the blocks surface (index over ALL candidate blocks),
    so line rows join back to ``extract_blocks`` explainability rows."""
    from ..sources.wordbox import sniff_content_type

    if sniff_content_type(payload) != "text/html":
        return []
    from .html_extract import extract_main_content

    out: List[Tuple[int, str, int]] = []
    for i, b in enumerate(extract_main_content(payload)["blocks"]):
        if not b["kept"]:
            continue
        norm = " ".join(b["text"].split())
        if not norm:
            continue
        out.append((i, hashlib.md5(norm.encode("utf-8")).hexdigest(), len(norm)))
    return out


def pos_key(url: str, block_id: int) -> str:
    """Global first-occurrence order key: (url, block_id) packed into ONE
    lexicographically-comparable string (zero-padded block id), because
    both Ray's Min aggregate and the DuckDB twin take min() of a single
    column. Consistency between the two engines is what matters; the
    packed order is total and deterministic."""
    return f"{url}|{block_id:06d}"
