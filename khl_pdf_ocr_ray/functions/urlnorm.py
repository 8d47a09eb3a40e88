"""URL canonicalization — the web-pipeline dedup key.

Common-Crawl-style corpora carry many URLs for one logical page (tracking
params, fragments, case-variant hosts, explicit default ports). The
canonical form here follows the widely published normalization rules
(RFC 3986 syntax-based normalization plus the standard tracking-param
strip):

- scheme and host lowercased;
- explicit default ports dropped (http:80, https:443);
- fragment dropped;
- tracking query params dropped (utm_*, fbclid, gclid, ref);
- remaining query params sorted by (key, value) for a stable order;
- the directory-style trailing slash stripped: one "/" after a NON-empty
  final segment ("/a/b/" -> "/a/b"). Empty path segments are significant
  per RFC 3986 and preserved ("/a//" stays "/a//"), which also keeps the
  rule idempotent (asserted by property test);
- empty path -> "/"; userinfo preserved (a significant component).

Pure function (stdlib urllib.parse only); used by the distributed
``url_dedup`` query and its sequential oracle twin, byte-for-byte shared.
"""

from __future__ import annotations

import re
from urllib.parse import parse_qsl, urlencode, urlsplit, urlunsplit

_DEFAULT_PORTS = {"http": "80", "https": "443"}
_TRACKING_PREFIXES = ("utm_",)
_TRACKING_KEYS = frozenset({"fbclid", "gclid", "ref"})


def _is_tracking(key: str) -> bool:
    k = key.lower()
    return k in _TRACKING_KEYS or any(k.startswith(p) for p in _TRACKING_PREFIXES)


def normalize_url(url: str) -> str:
    """Canonical form of ``url``; returns the input unchanged if it does
    not parse as a scheme://host URL (never raises)."""
    try:
        parts = urlsplit(url)
        # .hostname/.port parse lazily and can raise (non-numeric or
        # out-of-range port) — keep them inside the guard
        host = (parts.hostname or "").lower()
        port = parts.port
    except ValueError:
        return url
    if not parts.scheme or not parts.netloc:
        return url
    scheme = parts.scheme.lower()
    netloc = host
    if port is not None and str(port) != _DEFAULT_PORTS.get(scheme, ""):
        netloc = f"{host}:{port}"
    userinfo = parts.netloc.rpartition("@")[0]
    if userinfo:
        netloc = f"{userinfo}@{netloc}"
    path = parts.path or "/"
    if len(path) > 1 and path.endswith("/") and not path.endswith("//"):
        path = path[:-1]
    query = urlencode(
        sorted((k, v) for k, v in parse_qsl(parts.query, keep_blank_values=True)
               if not _is_tracking(k))
    )
    return urlunsplit((scheme, netloc, path, query, ""))


_RE_DIGITS = re.compile(r"[0-9]+")


def url_template(url: str) -> str:
    """Structural URL template: host + path with every digit run collapsed
    to ``{n}`` and the query/fragment dropped — the pattern-mining key
    that groups sitemap-generated URLs (/2023/891/game-891-....pdf and
    /2024/17/game-17-....pdf share one template). Non-parsing inputs
    collapse digits over the raw string (never raises)."""
    try:
        parts = urlsplit(url)
        host = (parts.hostname or "").lower()
    except ValueError:
        return _RE_DIGITS.sub("{n}", url)
    if not parts.scheme or not parts.netloc:
        return _RE_DIGITS.sub("{n}", url)
    return host + _RE_DIGITS.sub("{n}", parts.path or "/")
