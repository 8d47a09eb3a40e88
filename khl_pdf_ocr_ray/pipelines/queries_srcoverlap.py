"""Cross-source content-overlap matrix (data-mixing diagnostic).

``source_overlap_matrix``: for every unordered pair of sources that
shares at least one word trigram, the exact trigram-set Jaccard
``floor(1000 * |A∩B| / (|A|+|B|-|A∩B|))`` plus the raw set sizes — the
report a mixing decision reads before weighting sources into a
training blend (near-identical sources waste budget; the matrix also
flags scrape-of-a-scrape relationships). Pairs with zero overlap are
ABSENT (both sides agree; at web scale emitting the zero cells of a
|sources|^2 grid would dominate the output).

Plan / 100 TB notes: docs explode map-side to per-batch distinct
(source, trigram) rows; ONE trigram-keyed exchange makes them globally
distinct (Count aggregate, count dropped — the decontaminate-family
pattern). Per-source set sizes fall out of the same distinct stream
via a map-side combiner (|sources| rows). Pair generation runs inside
``groupby(ng).map_groups`` — bounded by (distinct sources per
trigram choose 2) <= (|sources| choose 2) rows per trigram — followed
by a map-side pair-count combiner, a (|sources| choose 2)-cardinality
Sum, and a broadcast-sizes finalize. Text leaves the scan only as
trigrams; no join operator anywhere. The trigram stream is the SAME
exchange family the decontamination op already ships at scale.

Degeneracy note: the synthetic corpus' 31-word vocab keeps trigram
space small (<= 31^3), so toy-scale Jaccards are uniformly nonzero;
the oracle checks EXACTNESS of the inclusion-exclusion arithmetic,
which is scale-free.

Reference analogue: /root/reference/app.py has no corpus surface;
brief scope (training-data pipeline diagnostics).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.arrowkit import select_rename
from ..remote import remote_fn

_QSO = "khl_pdf_ocr_ray.pipelines.queries_srcoverlap"

NG_N = 3  # word trigrams (the decontamination family's unit)


def src_trigram_explode(batch: pa.Table) -> pa.Table:
    """documents batch -> per-batch DISTINCT (source, ng) rows."""
    seen = set()
    for s, t in zip(
        batch["source"].to_pylist(), batch["text"].to_pylist()
    ):
        ws = (t or "").split(" ")
        for i in range(len(ws) - (NG_N - 1)):
            seen.add((s, " ".join(ws[i : i + NG_N])))
    if not seen:
        return pa.table(
            {
                "source": pa.array([], pa.string()),
                "ng": pa.array([], pa.string()),
            }
        )
    src, ng = zip(*sorted(seen))
    return pa.table(
        {
            "source": pa.array(list(src), pa.string()),
            "ng": pa.array(list(ng), pa.string()),
        }
    )


def drop_to_pair(batch: pa.Table) -> pa.Table:
    return batch.select(["source", "ng"])


def size_partial(batch: pa.Table) -> pa.Table:
    """globally-distinct (source, ng) -> per-source set-size partials."""
    g = batch.group_by("source").aggregate([([], "count_all")])
    g = select_rename(g, source="source", n="count_all")
    return g.set_column(1, "n", g["n"].cast(pa.int64()))


def ng_source_pairs(group: pa.Table) -> pa.Table:
    """One trigram's distinct sources -> unordered co-occurrence pairs."""
    src = sorted(set(group["source"].to_pylist()))
    if len(src) < 2:
        return pa.table(
            {
                "src_a": pa.array([], pa.string()),
                "src_b": pa.array([], pa.string()),
                "n": pa.array([], pa.int64()),
            }
        )
    ia, ib = np.triu_indices(len(src), k=1)
    return pa.table(
        {
            "src_a": pa.array([src[i] for i in ia], pa.string()),
            "src_b": pa.array([src[j] for j in ib], pa.string()),
            "n": pa.array(np.ones(len(ia), dtype=np.int64), pa.int64()),
        }
    )


def pair_count_partial(batch: pa.Table) -> pa.Table:
    """Map-side combiner over the per-trigram pair stream."""
    g = batch.group_by(["src_a", "src_b"]).aggregate([("n", "sum")])
    g = select_rename(g, src_a="src_a", src_b="src_b", n="n_sum")
    return g.set_column(2, "n", g["n"].cast(pa.int64()))


def overlap_finalize(batch: pa.Table, sizes_ref) -> pa.Table:
    """(src_a, src_b, n_common) + broadcast sizes -> exact Jaccard."""
    import ray as _ray

    sizes = _ray.get(sizes_ref)
    a = batch["src_a"].to_pylist()
    b = batch["src_b"].to_pylist()
    common = batch["n_common"].to_numpy(zero_copy_only=False).astype(np.int64)
    na = np.array([sizes[s] for s in a], dtype=np.int64)
    nb = np.array([sizes[s] for s in b], dtype=np.int64)
    union = na + nb - common
    return pa.table(
        {
            "src_a": pa.array(a, pa.string()),
            "src_b": pa.array(b, pa.string()),
            "n_common": pa.array(common, pa.int64()),
            "n_a": pa.array(na, pa.int64()),
            "n_b": pa.array(nb, pa.int64()),
            "jaccard_permille": pa.array(1000 * common // union, pa.int64()),
        }
    )


def q_source_overlap_matrix(sf_dir: str) -> "object":
    """(src_a, src_b, n_common, n_a, n_b, jaccard_permille)."""
    import ray
    from ray.data.aggregate import Count, Sum

    from .queries import _t

    distinct = (
        _t(sf_dir, "documents", ["source", "text"])
        .map_batches(
            remote_fn(_QSO, "src_trigram_explode"),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .groupby(["source", "ng"])
        .aggregate(Count(alias_name="c"))
        .map_batches(
            remote_fn(_QSO, "drop_to_pair"),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .materialize()  # reused: per-source sizes + per-ng pair generation
    )
    sizes = {
        r["source"]: int(r["n"])
        for r in (
            distinct.map_batches(
                remote_fn(_QSO, "size_partial"),
                batch_format="pyarrow",
                zero_copy_batch=True,
            )
            .groupby("source")
            .aggregate(Sum("n", alias_name="n"))
            .take_all()  # |sources| rows — dimension-sized by contract
        )
    }
    sizes_ref = ray.put(sizes)
    return (
        distinct.groupby("ng")
        .map_groups(remote_fn(_QSO, "ng_source_pairs"), batch_format="pyarrow")
        .map_batches(
            remote_fn(_QSO, "pair_count_partial"),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .groupby(["src_a", "src_b"])
        .aggregate(Sum("n", alias_name="n_common"))
        .map_batches(
            remote_fn(_QSO, "overlap_finalize", sizes_ref=sizes_ref),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
    )


SQL_SOURCE_OVERLAP_MATRIX = """
WITH u AS (
  SELECT doc_id, source,
         unnest(string_split(coalesce(text, ''), ' ')) AS w,
         generate_subscripts(string_split(coalesce(text, ''), ' '), 1) AS i
  FROM documents),
t AS (
  SELECT DISTINCT a.source, a.w || ' ' || b.w || ' ' || c.w AS ng
  FROM u a
  JOIN u b ON b.doc_id = a.doc_id AND b.i = a.i + 1
  JOIN u c ON c.doc_id = a.doc_id AND c.i = a.i + 2),
sizes AS (SELECT source, CAST(count(*) AS BIGINT) AS n FROM t GROUP BY 1),
pairs AS (
  SELECT a.source AS src_a, b.source AS src_b,
         CAST(count(*) AS BIGINT) AS n_common
  FROM t a JOIN t b ON a.ng = b.ng AND a.source < b.source
  GROUP BY 1, 2)
SELECT p.src_a, p.src_b, p.n_common, na.n AS n_a, nb.n AS n_b,
       CAST(1000 * p.n_common // (na.n + nb.n - p.n_common) AS BIGINT)
         AS jaccard_permille
FROM pairs p
JOIN sizes na ON na.source = p.src_a
JOIN sizes nb ON nb.source = p.src_b
"""

SRCOVERLAP_QUERIES = {"source_overlap_matrix": q_source_overlap_matrix}
SRCOVERLAP_ORACLES = {"source_overlap_matrix": SQL_SOURCE_OVERLAP_MATRIX}
