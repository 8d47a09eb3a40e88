"""Hyperlink + page-metadata extraction from HTML payloads.

The link-graph side of the extraction tier: the reference repo walks a
single document's internal structure (/root/reference/app.py:86-117); a
web-scale extractor must also surface the OUTGOING EDGES of every page
(hrefs + anchor texts + the structural container they sit in) because the
link graph feeds dedup (mirror detection), ranking (host PageRank — see
pipelines/queries_extract.q_host_pagerank) and anchor-text corpora.

Built on the stdlib ``html.parser`` like functions/html_extract.py (no
lxml in the container). Pure per-document functions; run inside
``map_batches``. Deterministic: same bytes in -> same rows out.

NOT part of ``extraction_version()`` (link rows never alter extracted
text); hashed into the oracle-dump cache key instead (state/oracle_dump.py)
so edits here rebuild the sequential twins without invalidating extract
checkpoints.
"""

from __future__ import annotations

import re
from html.parser import HTMLParser
from typing import List, Optional, Tuple

from .textgeom import normalize_ws

# structural containers we attribute a link to (innermost wins)
CONTAINER_TAGS = frozenset(
    {"nav", "header", "footer", "aside", "article", "main", "section"}
)

_RE_YEAR = re.compile(r"\b(19\d{2}|20\d{2})\b")


class _LinkParser(HTMLParser):
    """Single pass collecting (href, anchor_text, container) per <a> plus
    page metadata (title, paragraph/anchor counts, footer year)."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.links: List[Tuple[str, List[str], str]] = []  # href, parts, container
        self._containers: List[str] = []
        self._open_href: Optional[str] = None
        self._title_parts: List[str] = []
        self._in_title = False
        self._footer_parts: List[str] = []
        self._footer_depth = 0
        self.n_paras = 0

    def handle_starttag(self, tag: str, attrs) -> None:
        if tag in CONTAINER_TAGS:
            self._containers.append(tag)
            if tag == "footer":
                self._footer_depth += 1
        elif tag == "title":
            self._in_title = True
        elif tag == "p":
            self.n_paras += 1
        elif tag == "a":
            href = ""
            for k, v in attrs:
                if k == "href" and v is not None:
                    href = v
                    break
            container = self._containers[-1] if self._containers else ""
            self.links.append((href, [], container))
            self._open_href = href

    def handle_endtag(self, tag: str) -> None:
        if tag in CONTAINER_TAGS:
            if tag == "footer" and self._footer_depth:
                self._footer_depth -= 1
            # tolerate mis-nesting: pop the innermost matching container
            for i in range(len(self._containers) - 1, -1, -1):
                if self._containers[i] == tag:
                    del self._containers[i]
                    break
        elif tag == "title":
            self._in_title = False
        elif tag == "a":
            self._open_href = None

    def handle_data(self, data: str) -> None:
        if self._in_title:
            self._title_parts.append(data)
        if self._open_href is not None and self.links:
            self.links[-1][1].append(data)
        if self._footer_depth:
            self._footer_parts.append(data)

    @property
    def title(self) -> str:
        return normalize_ws("".join(self._title_parts))

    @property
    def footer_year(self) -> int:
        m = _RE_YEAR.search(" ".join(self._footer_parts))
        return int(m.group(1)) if m else 0


def _decode(payload: bytes) -> str:
    return payload.decode("utf-8", errors="replace")


def extract_links(payload: bytes) -> List[Tuple[int, str, str, str]]:
    """(link_id, href, anchor, container) rows for one HTML payload, in
    document order. link_id is the 0-based position among <a> tags."""
    p = _LinkParser()
    p.feed(_decode(payload))
    p.close()
    return [
        (i, href, normalize_ws("".join(parts)), container)
        for i, (href, parts, container) in enumerate(p.links)
    ]


def extract_meta(payload: bytes) -> Tuple[str, int, int, int]:
    """(title, n_paras, n_links, footer_year) for one HTML payload."""
    p = _LinkParser()
    p.feed(_decode(payload))
    p.close()
    return (p.title, p.n_paras, len(p.links), p.footer_year)
