"""Host-level link graph + integer PageRank kernels.

The synthesized pages corpus has only relative hrefs (no cross-host
links), so the graph operator derives a deterministic PLANTED edge per
page — the same synthesize-on-read pattern the url-dedup family uses for
messy URL variants (pipelines/queries_extract.py:url_variants_batch):
every page on host H links to ``site{crc32(url) % 40}.example.org``.
What the gate certifies is the DISTRIBUTED iteration (edge combiner,
weighted out-degree aggregate, per-iteration rank join + incoming-mass
shuffle), not the planted topology.

PageRank runs entirely in int64 fixed-point so both engines are
bit-identical under any batching/partitioning:

    rank0(v)    = PR_SCALE
    contrib(e)  = (r_src * w_e * PR_DAMP_NUM) // (wout_src * PR_DAMP_DEN)
    rank'(v)    = PR_TELEPORT + sum over incoming e of contrib(e)

One floor division per edge (operands identical on both engines), then
an order-independent integer sum. Dangling hosts (no out-edges) leak
their damped mass — the standard simplification; noted, not corrected.
"""

from __future__ import annotations

import zlib
from typing import Tuple

PR_SCALE = 1 << 20
PR_DAMP_NUM, PR_DAMP_DEN = 85, 100
PR_TELEPORT = PR_SCALE * (PR_DAMP_DEN - PR_DAMP_NUM) // PR_DAMP_DEN
PR_ITERS = 3
_N_SITES = 40  # matches sources/synth.py's host universe


def host_of(url: str) -> str:
    rest = url.split("://", 1)[1] if "://" in url else url
    return rest.split("/", 1)[0]


def host_edge(url: str) -> Tuple[str, str]:
    """(src_host, dst_host) for one page: the planted deterministic
    outlink. Self-links are legitimate graph rows."""
    return host_of(url), f"site{zlib.crc32(url.encode('utf-8')) % _N_SITES}.example.org"


# deterministic blocklist (synthesize-on-read convention): every 7th site
# host is banned outright, plus one path prefix everywhere
BLOCK_HOSTS = tuple(f"site{n}.example.org" for n in range(0, 40, 7))
BLOCK_PATH_PREFIX = "/p/1"


def block_verdict(url: str) -> Tuple[str, bool]:
    """(host, blocked) for one url under the host/path blocklist."""
    h = host_of(url)
    rest = url.split("://", 1)[1] if "://" in url else url
    path = rest[rest.index("/"):] if "/" in rest else "/"
    return h, (h in BLOCK_HOSTS or path.startswith(BLOCK_PATH_PREFIX))


def pr_contrib(r_src: int, w: int, wout: int) -> int:
    """The per-edge damped contribution — THE shared fixed-point formula
    (single floor division; both engines pass identical operands)."""
    return (r_src * w * PR_DAMP_NUM) // (wout * PR_DAMP_DEN)


HITS_SCALE = 1 << 20
HITS_ITERS = 3


def hits_normalize(raw: int, mx: int) -> int:
    """THE shared HITS normalization — scale so the max score is
    HITS_SCALE (single floor division, identical operands on both
    engines; mx == 0 only on an edgeless graph)."""
    return (raw * HITS_SCALE) // mx if mx else 0


def hits_sequential(edges, nodes, iters: int = HITS_ITERS):
    """Single-process twin (Kleinberg 1999, int64 fixed point): edges =
    {(src, dst): w}, nodes = iterable of host strings. Returns
    {host: (hub_fx, auth_fx)}. Per round: raw authority = sum of
    w * hub(src) over in-edges, max-normalized; then raw hub = sum of
    w * auth(dst) over out-edges, max-normalized. Order-independent
    integer sums + one shared floor division per node, so any
    partitioning of the distributed plan is bit-identical."""
    hub = {v: HITS_SCALE for v in nodes}
    auth = {v: 0 for v in nodes}
    for _ in range(iters):
        raw = {v: 0 for v in nodes}
        for (s, d), w in edges.items():
            raw[d] += w * hub[s]
        mx = max(raw.values(), default=0)
        auth = {v: hits_normalize(r, mx) for v, r in raw.items()}
        raw = {v: 0 for v in nodes}
        for (s, d), w in edges.items():
            raw[s] += w * auth[d]
        mx = max(raw.values(), default=0)
        hub = {v: hits_normalize(r, mx) for v, r in raw.items()}
    return {v: (hub[v], auth[v]) for v in nodes}


def pagerank_sequential(edges, nodes, iters: int = PR_ITERS):
    """Single-process twin: edges = {(src, dst): w}, nodes = iterable of
    host strings. Returns {host: rank_fx}. Used by the oracle dump; the
    distributed plan composes the same formula out of joins/groupbys."""
    wout: dict = {}
    for (s, _), w in edges.items():
        wout[s] = wout.get(s, 0) + w
    rank = {v: PR_SCALE for v in nodes}
    for _ in range(iters):
        nxt = {v: PR_TELEPORT for v in rank}
        for (s, d), w in edges.items():
            nxt[d] = nxt.get(d, PR_TELEPORT) + pr_contrib(rank[s], w, wout[s])
        rank = nxt
    return rank
