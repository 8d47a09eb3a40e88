"""Main-content extraction from HTML via text/link-density block scoring.

A readability/trafilatura-style boilerplate stripper (north_star component
(1) in BASELINE.json) built on the stdlib ``html.parser`` — the container
has no lxml. Pure per-document function; runs inside ``map_batches``.

Model (Boilerpipe/jusText-flavored, reimplemented from the published idea,
not from any codebase):
- subtrees under chrome tags (nav/header/footer/aside/script/style/...) are
  dropped wholesale;
- every block-level element yields a *block* with its direct text, the
  number of descendant tags, and the number of characters under <a>;
- a block is content iff len(text) >= min_text_len and
  link_density = link_chars/len(text) <= max_link_density;
- the document text is the kept blocks' normalized text joined with "\\n",
  with span offsets recorded per block.

The analogous reference behavior is the PDF line reconstruction + join
(/root/reference/app.py:97-117); HTML is the generalization the north_star
asks for. Deterministic: same bytes in -> same text out, byte-identical.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from html.parser import HTMLParser
from typing import Dict, List, Optional, Tuple

from .textgeom import normalize_ws

CHROME_TAGS = frozenset(
    {
        "script",
        "style",
        "noscript",
        "template",
        "svg",
        "nav",
        "header",
        "footer",
        "aside",
        "form",
        "button",
        "iframe",
        "select",
        "option",
    }
)

BLOCK_TAGS = frozenset(
    {
        "p",
        "div",
        "article",
        "section",
        "main",
        "li",
        "h1",
        "h2",
        "h3",
        "h4",
        "h5",
        "h6",
        "td",
        "th",
        "blockquote",
        "pre",
        "figcaption",
        "dd",
        "dt",
    }
)

VOID_TAGS = frozenset({"br", "hr", "img", "meta", "link", "input", "area", "base", "col", "embed", "source", "track", "wbr"})

DEFAULT_MIN_TEXT_LEN = 25
DEFAULT_MAX_LINK_DENSITY = 0.33


@dataclass
class Block:
    kind: str
    parts: List[str] = field(default_factory=list)
    link_chars: int = 0
    total_chars: int = 0
    inner_tags: int = 0

    @property
    def text(self) -> str:
        return normalize_ws("".join(self.parts))

    @property
    def link_density(self) -> float:
        return self.link_chars / self.total_chars if self.total_chars else 0.0

    @property
    def text_density(self) -> float:
        return self.total_chars / (1.0 + self.inner_tags)


class _ContentParser(HTMLParser):
    """Single-pass block collector. Text is attributed to the innermost open
    block only, so nested blocks never double-count characters."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.blocks: List[Block] = []
        self._open: List[Block] = []
        self._skip_depth = 0
        self._anchor_depth = 0
        self._in_title = False
        self.title = ""

    # -- tag events ----------------------------------------------------------
    def handle_starttag(self, tag: str, attrs) -> None:
        if tag in VOID_TAGS:
            if self._skip_depth == 0 and self._open:
                self._open[-1].inner_tags += 1
                if tag == "br":
                    self._open[-1].parts.append(" ")
            return
        if self._skip_depth or tag in CHROME_TAGS:
            self._skip_depth += 1
            return
        if tag == "title":
            self._in_title = True
            return
        if tag == "a":
            self._anchor_depth += 1
        if self._open:
            self._open[-1].inner_tags += 1
        if tag in BLOCK_TAGS:
            blk = Block(kind=tag)
            self._open.append(blk)

    def handle_endtag(self, tag: str) -> None:
        if tag in VOID_TAGS:
            # void tags never incremented the skip depth in handle_starttag
            # (and handle_startendtag fires both events for <img/> etc.), so
            # decrementing here would leak chrome content into the output
            return
        if self._skip_depth:
            self._skip_depth -= 1
            return
        if tag == "title":
            self._in_title = False
            return
        if tag == "a" and self._anchor_depth:
            self._anchor_depth -= 1
            return
        if tag in BLOCK_TAGS:
            # close the innermost matching open block (tolerates misnesting)
            for i in range(len(self._open) - 1, -1, -1):
                if self._open[i].kind == tag:
                    blk = self._open.pop(i)
                    self.blocks.append(blk)
                    break

    def handle_data(self, data: str) -> None:
        if self._skip_depth:
            return
        if self._in_title:
            self.title += data
            return
        if not self._open:
            return
        blk = self._open[-1]
        blk.parts.append(data)
        n = len(data.strip())
        blk.total_chars += n
        if self._anchor_depth:
            blk.link_chars += n

    def close(self) -> None:  # flush still-open blocks (unclosed tags)
        super().close()
        while self._open:
            self.blocks.append(self._open.pop())


def extract_blocks_reference(html: str) -> Tuple[List[Block], str]:
    """html.parser-based block collector — kept as the equivalence oracle
    for the fast tokenizer (tests assert identical output on the corpus)."""
    p = _ContentParser()
    try:
        p.feed(html)
        p.close()
    except Exception:
        pass  # keep whatever was collected before the parse error
    return p.blocks, normalize_ws(p.title)


# --- fast tokenizer ----------------------------------------------------------
# The stdlib html.parser costs ~1.3 ms/doc and dominated the extraction
# kernel (67% of profile time). This scanner emits the SAME event stream
# (start/end tags lowercased, attrs ignored, char-refs decoded in text
# runs, script/style bodies skipped as raw text) with one compiled regex
# pass; the block state machine below mirrors _ContentParser exactly.

import re as _re
from html import unescape as _unescape

_TOKEN_RE = _re.compile(
    r"<!--.*?(?:-->|\Z)"  # comments (unterminated -> to EOF)
    r"|<!\[CDATA\[.*?(?:\]\]>|\Z)"
    r"|<![^>]*>"  # doctype / other declarations
    r"|<\?[^>]*>"  # processing instructions
    r"|</\s*([a-zA-Z][a-zA-Z0-9-]*)[^>]*>"  # close tag  (group 1)
    r"|<([a-zA-Z][a-zA-Z0-9-]*)"  # open tag   (group 2)
    r"((?:\"[^\"]*\"|'[^']*'|[^>\"'])*)>",  # its attrs  (group 3)
    _re.S,
)

_RAWTEXT = ("script", "style")  # html.parser CDATA-mode elements


def extract_blocks(html: str) -> Tuple[List[Block], str]:
    """Parse HTML into candidate blocks plus the page title (fast path)."""
    blocks: List[Block] = []
    open_blocks: List[Block] = []
    skip_depth = 0
    anchor_depth = 0
    in_title = False
    title_parts: List[str] = []
    low = None  # lazily lowered copy for rawtext close-tag search

    def data_event(data: str) -> None:
        nonlocal skip_depth
        if skip_depth or not data:
            return
        if "&" in data:
            data = _unescape(data)
        if in_title:
            title_parts.append(data)
            return
        if not open_blocks:
            return
        blk = open_blocks[-1]
        blk.parts.append(data)
        n = len(data.strip())
        blk.total_chars += n
        if anchor_depth:
            blk.link_chars += n

    pos = 0
    n = len(html)
    while pos < n:
        m = _TOKEN_RE.search(html, pos)
        if m is None:
            data_event(html[pos:])
            break
        if m.start() > pos:
            data_event(html[pos : m.start()])
        pos = m.end()
        close, opened, attrs = m.group(1, 2, 3)
        if opened is not None:
            tag = opened.lower()
            self_closing = attrs.rstrip().endswith("/")
            # start-tag event (mirrors _ContentParser.handle_starttag)
            if tag in VOID_TAGS:
                if skip_depth == 0 and open_blocks:
                    open_blocks[-1].inner_tags += 1
                    if tag == "br":
                        open_blocks[-1].parts.append(" ")
                continue  # handle_endtag is a no-op for void tags
            if skip_depth or tag in CHROME_TAGS:
                skip_depth += 1
                if tag in _RAWTEXT and not self_closing:
                    # html.parser never tokenizes inside script/style: jump
                    # straight to the matching close tag as one raw run
                    if low is None:
                        low = html.lower()
                    close_at = low.find(f"</{tag}", pos)
                    if close_at < 0:
                        break  # unterminated rawtext swallows the rest
                    gt = html.find(">", close_at)
                    pos = n if gt < 0 else gt + 1
                    skip_depth -= 1
                elif self_closing:
                    skip_depth -= 1  # startendtag fires both events
                continue
            if tag == "title":
                if self_closing:
                    continue
                in_title = True
                continue
            if tag == "a":
                anchor_depth += 1
            if open_blocks:
                open_blocks[-1].inner_tags += 1
            if tag in BLOCK_TAGS:
                open_blocks.append(Block(kind=tag))
            if not self_closing:
                continue
            close = tag  # <tag/> also fires the end-tag event below
        if close is not None:
            tag = close.lower()
            if tag in VOID_TAGS:
                continue
            if skip_depth:
                skip_depth -= 1
                continue
            if tag == "title":
                in_title = False
                continue
            if tag == "a" and anchor_depth:
                anchor_depth -= 1
                continue
            if tag in BLOCK_TAGS:
                for i in range(len(open_blocks) - 1, -1, -1):
                    if open_blocks[i].kind == tag:
                        blocks.append(open_blocks.pop(i))
                        break
    while open_blocks:  # flush unclosed blocks (same as _ContentParser.close)
        blocks.append(open_blocks.pop())
    return blocks, normalize_ws("".join(title_parts))


def extract_main_content(
    payload: bytes | str,
    min_text_len: int = DEFAULT_MIN_TEXT_LEN,
    max_link_density: float = DEFAULT_MAX_LINK_DENSITY,
) -> Dict:
    """Extract the main content of an HTML page.

    Returns ``{text, title, spans, blocks}`` where ``spans`` are
    ``(start, end, kind)`` offsets into ``text`` (one per kept block, joined
    with "\\n") and ``blocks`` carries the scored block table
    (kind, text, link_density, text_density, kept).
    """
    if isinstance(payload, bytes):
        html = payload.decode("utf-8", errors="replace")
    else:
        html = payload
    blocks, title = extract_blocks(html)

    kept_texts: List[str] = []
    spans: List[Dict] = []
    block_rows: List[Dict] = []
    offset = 0
    for blk in blocks:
        text = blk.text
        keep = (
            len(text) >= min_text_len and blk.link_density <= max_link_density
        )
        block_rows.append(
            {
                "kind": blk.kind,
                "text": text,
                "link_density": round(blk.link_density, 6),
                "text_density": round(blk.text_density, 6),
                "kept": keep,
            }
        )
        if keep:
            if kept_texts:
                offset += 1  # the "\n" joiner
            start = offset
            kept_texts.append(text)
            offset += len(text)
            spans.append({"start": start, "end": offset, "kind": blk.kind})
    return {
        "text": "\n".join(kept_texts),
        "title": title,
        "spans": spans,
        "blocks": block_rows,
    }
