"""Contrastive training pairs from certified near-dup clusters.

``contrastive_pairs``: turn the MinHash duplicate clusters into a
self-supervised training-pair manifest — per cluster, the anchor (its
smallest doc id) pairs with every other member as a POSITIVE (label 1),
plus two deterministic hash-drawn NEGATIVES from the base corpus
(label 0; a draw that collides with the anchor's own cluster membership
is dropped, not redrawn — SQL-expressible determinism). This is the
standard way a dedup pass double-serves as contrastive supervision
(near-dups are free positives; SimCSE/CLIP-style pair mining).

Negative draw: ``((anchor % 2147483647) * 2654435761 + j * 97) % 2^32
% n_base`` for j in {1, 2} — the repo-wide Knuth residue convention,
int64-safe, identical in numpy and DuckDB. n_base = |documents| (dense
0..n-1 ids asserted at build).

Plan / 100 TB notes: clusters are duplication-cardinality (tiny next to
the corpus); the pair fold runs per cluster group with the member set
IN HAND (so the negative-collision check is local — no extra exchange);
positives are anchor-star (linear in cluster size, never quadratic).
The only exchange is the cluster groupby the dedup pass already pays.

Oracle: dump-derived SQL — the certified sequential cluster dump, the
same anchor/star/negative arithmetic.

Reference analogue: none in /root/reference/app.py; brief scope (ML
prep: training-pair manifests from dedup structure).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..remote import remote_fn

_QC = "khl_pdf_ocr_ray.pipelines.queries_contrastive"

NEG_PER_ANCHOR = 2
NEG_MULT = 2654435761
NEG_MOD = 1 << 32


def neg_draws(anchor: int, n_base: int) -> list:
    """The deterministic negative candidates for one anchor."""
    return [
        ((anchor % 2147483647) * NEG_MULT + j * 97) % NEG_MOD % n_base
        for j in range(1, NEG_PER_ANCHOR + 1)
    ]


def cluster_pairs_group(g: pd.DataFrame, n_base: int) -> pd.DataFrame:
    """One cluster's members -> anchor-star positives + hash negatives."""
    members = np.sort(g["doc_id"].to_numpy().astype(np.int64))
    anchor = int(members[0])
    out_a, out_o, out_l = [], [], []
    for m in members[1:]:
        out_a.append(anchor)
        out_o.append(int(m))
        out_l.append(1)
    mset = set(int(m) for m in members)
    for neg in neg_draws(anchor, n_base):
        if neg not in mset:  # collision -> dropped, not redrawn
            out_a.append(anchor)
            out_o.append(int(neg))
            out_l.append(0)
    return pd.DataFrame(
        {
            "cluster_id": pd.Series([int(g["cluster_id"].iloc[0])] * len(out_a), dtype="int64"),
            "anchor": pd.Series(out_a, dtype="int64"),
            "other": pd.Series(out_o, dtype="int64"),
            "label": pd.Series(out_l, dtype="int64"),
        }
    )


def q_contrastive_pairs(sf_dir: str) -> "object":
    """(cluster_id, anchor, other, label)."""
    import os

    import pyarrow.parquet as pq

    from .queries import q_minhash_clusters

    md = pq.read_metadata(os.path.join(sf_dir, "documents.parquet"))
    n_base = md.num_rows
    # negatives index the dense 0..n-1 id space — verify from footer stats
    idx = md.schema.names.index("doc_id")
    stats = [md.row_group(i).column(idx).statistics for i in range(md.num_row_groups)]
    assert min(s.min for s in stats) == 0 and max(s.max for s in stats) == n_base - 1, (
        "documents.doc_id must be dense 0..n-1 for hash negatives"
    )
    clusters = q_minhash_clusters(sf_dir)
    return clusters.groupby("cluster_id").map_groups(
        remote_fn(_QC, "cluster_pairs_group", n_base=n_base),
        batch_format="pandas",
    )


def contrastive_oracle_sql(clusters_path: str) -> str:
    return f"""
WITH n AS (SELECT count(*) AS n_base FROM documents),
cl AS (SELECT doc_id, cluster_id
       FROM read_parquet('{clusters_path}')),
anch AS (SELECT cluster_id, min(doc_id) AS anchor FROM cl GROUP BY 1),
pos AS (
  SELECT cl.cluster_id, anch.anchor, cl.doc_id AS other, 1 AS label
  FROM cl JOIN anch ON anch.cluster_id = cl.cluster_id
  WHERE cl.doc_id <> anch.anchor),
negdraw AS (
  SELECT a.cluster_id, a.anchor,
         CAST(((a.anchor % 2147483647) * {NEG_MULT} + j * 97)
              % {NEG_MOD} % n.n_base AS BIGINT) AS other,
         0 AS label
  FROM anch a, n, (SELECT unnest([1, 2]) AS j)),
neg AS (
  SELECT nd.* FROM negdraw nd
  LEFT JOIN cl ON cl.cluster_id = nd.cluster_id AND cl.doc_id = nd.other
  WHERE cl.doc_id IS NULL)
SELECT cluster_id, anchor, other, CAST(label AS BIGINT) AS label FROM pos
UNION ALL
SELECT cluster_id, anchor, other, CAST(label AS BIGINT) AS label FROM neg
"""


CONTRASTIVE_QUERIES = {"contrastive_pairs": q_contrastive_pairs}
