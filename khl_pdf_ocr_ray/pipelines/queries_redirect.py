"""Redirect-chain resolution (crawl-frontier canonicalization).

``redirect_resolve``: every URL id resolves to the TERMINAL target of
its redirect chain plus the exact hop count — the canonicalization a
crawl pipeline runs before dedup/frontier scheduling so A -> B -> C
chains collapse to C (the HTTP 3xx analogue of url_dedup's syntactic
normalization). Planted chains: doc_id redirects to doc_id - 1 unless
doc_id % 16 == 0 (those are terminals), giving chain lengths 0..15.

Algorithm: POINTER DOUBLING over the functional graph p(x) = its
redirect target (x itself for terminals): each round joins the mapping
with itself on p = x', composing p <- p(p) and ADDING the hop counts,
so chains of length L resolve in ceil(log2 L) rounds — 4 join rounds
for the planted 15-chains where naive iteration needs 15. Convergence
is detected by the HOPS-column sum — composing adds hops(p) >= 1 to
every unresolved row, so hops-sum stability <=> fixpoint even for
cycles (a 2-cycle leaves the TARGET sum invariant and would falsely
converge that weaker check); rounds are capped and non-convergence
raises loudly.

Plan / 100 TB notes: the mapping is |urls| slim int rows; every round
is ONE keyed self-join (safe_join, partitions from the known row
count) plus a map-only compose — O(log maxchain) joins total, nothing
driver-side but one int64 sum per round. Redirect CYCLES (a -> b -> a)
would never converge — the loud round cap is the guard, and the
decreasing-target invariant of the planted rule makes cycles
impossible here (documented: real crawls break cycles by min-id
tie-break before resolution).

Oracle: static recursive SQL walking each chain linearly — an
INDEPENDENT algorithm (O(L) walk vs O(log L) doubling), so agreement
checks the doubling algebra, not just the kernels.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

from ..remote import remote_fn

_QR2 = "khl_pdf_ocr_ray.pipelines.queries_redirect"

REDIRECT_MOD = 16      # doc_id % 16 == 0 -> terminal; else redirect to id-1
RESOLVE_MAX_ROUNDS = 12  # loud cap: 2^12 chain hops is far beyond any sane
                         # redirect chain; hitting it means a cycle


def redirect_map_batch(batch: pa.Table) -> pa.Table:
    """doc_id -> the initial mapping (x, p, hops): p = x-1 for redirecting
    ids, x for terminals; hops = 1 for redirecting ids else 0."""
    x = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    is_redirect = (x % REDIRECT_MOD) != 0
    p = np.where(is_redirect, x - 1, x)
    hops = is_redirect.astype(np.int64)
    return pa.table(
        {
            "x": pa.array(x),
            "p": pa.array(p),
            "hops": pa.array(hops),
        }
    )


def compose_project(batch: pa.Table) -> pa.Table:
    """Joined (x, p, hops, p2, hops2) -> the composed mapping."""
    return pa.table(
        {
            "x": pc.cast(batch["x"], pa.int64()),
            "p": pc.cast(batch["p2"], pa.int64()),
            "hops": pc.cast(pc.add(batch["hops"], batch["hops2"]), pa.int64()),
        }
    )


def rename_probe(batch: pa.Table) -> pa.Table:
    from ..functions.arrowkit import select_rename

    return select_rename(batch, x2="x", p2="p", hops2="hops")


def resolve_finalize(batch: pa.Table) -> pa.Table:
    from ..functions.arrowkit import select_rename

    return select_rename(batch, url_id="x", terminal_id="p", hops="hops")


def resolve_mapping(mapping: rd.Dataset, max_rounds: int = RESOLVE_MAX_ROUNDS) -> rd.Dataset:
    """Pointer-double a total (x, p, hops) mapping to its fixpoint;
    raises loudly if ``max_rounds`` doubling rounds don't converge
    (redirect cycle). Exposed separately so tests can inject a crafted
    cyclic mapping."""
    from ..joins import partitions_for_rows, safe_join

    mapping = mapping.materialize()
    nparts = partitions_for_rows(mapping.count())
    prev_sum = None
    converged = False
    for _ in range(max_rounds):
        # convergence on the HOPS sum, not the target sum: composing adds
        # hops(p) >= 1 to every still-unresolved row, so hops-sum
        # stability <=> fixpoint even for CYCLES, where the target sum is
        # invariant under the swap and would falsely converge
        cur = mapping.sum("hops")  # one driver int per round
        if cur == prev_sum:
            converged = True
            break
        prev_sum = cur
        probe = mapping.map_batches(
            remote_fn(_QR2, "rename_probe"), batch_format="pyarrow"
        )
        mapping = (
            safe_join(
                mapping,
                probe,
                on=("p",),
                right_on=("x2",),
                assume_non_empty=True,  # mapping is total over all ids
                num_partitions=nparts,
            )
            .map_batches(remote_fn(_QR2, "compose_project"), batch_format="pyarrow")
            .materialize()
        )
    if not converged:
        raise RuntimeError(
            f"redirect resolution did not converge in {max_rounds} "
            "doubling rounds — redirect cycle present; break cycles before "
            "resolution"
        )
    return mapping


def q_redirect_resolve(sf_dir: str) -> rd.Dataset:
    """(url_id, terminal_id, hops) — see module docstring."""
    from .queries import _t

    docs = _t(sf_dir, "documents", ["doc_id"])
    mapping = docs.map_batches(
        remote_fn(_QR2, "redirect_map_batch"),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    return resolve_mapping(mapping).map_batches(
        remote_fn(_QR2, "resolve_finalize"), batch_format="pyarrow"
    )


SQL_REDIRECT_RESOLVE = f"""
WITH RECURSIVE walk AS (
  SELECT doc_id AS url_id, doc_id AS cur, CAST(0 AS BIGINT) AS hops
  FROM documents
  UNION ALL
  SELECT url_id, cur - 1, hops + 1
  FROM walk WHERE cur % {REDIRECT_MOD} <> 0)
SELECT url_id, CAST(cur AS BIGINT) AS terminal_id, hops
FROM walk WHERE cur % {REDIRECT_MOD} = 0
"""

REDIRECT_QUERIES = {"redirect_resolve": q_redirect_resolve}
REDIRECT_ORACLES = {"redirect_resolve": SQL_REDIRECT_RESOLVE}
