"""Cross-source duplication matrix over the near-dup pair set.

``dup_source_matrix``: for every MinHash+LSH near-dup pair, attribute
both members to their corpus SOURCE and count pairs per unordered
(source_a, source_b) cell — the standard contamination diagnostic for a
multi-source training corpus ("which feeds duplicate each other?").
Within-source cells sit on the diagonal; off-diagonal mass is
cross-feed duplication that per-source dedup would MISS (the argument
for corpus-global dedup, quantified).

Plan / 100 TB notes: the pair set is duplication-cardinality (tiny next
to the corpus); attributing sources is two slim joins of the pair table
against the (doc_id, source) projection — safe_join's materialize
fallback is correct here because pair-set emptiness is data-dependent
(joins.py contract) and the pair pipeline is consumed exactly once. The
final exchange is sources² cells. Variant members (planted doc_id +
VARIANT_OFFSET) inherit their base doc's source before the join, so the
matrix reflects true provenance.

Oracle: dump-backed pair set (the sequential MinHash twin) + the same
source attribution in SQL over the documents view.

Reference analogue: none in /root/reference/app.py (single-doc service);
brief scope (dedup analytics as first-class components).
"""

from __future__ import annotations

import pyarrow as pa

from ..remote import remote_fn

_QD = "khl_pdf_ocr_ray.pipelines.queries_dupmatrix"


def normalize_pair_batch(batch: pa.Table) -> pa.Table:
    """Map planted-variant ids back to their base doc ids."""
    import pyarrow.compute as pc

    from ..stages.dedup import VARIANT_OFFSET

    def norm(col):
        return pc.if_else(
            pc.greater_equal(col, VARIANT_OFFSET),
            pc.subtract(col, VARIANT_OFFSET),
            col,
        )

    return pa.table({"a": norm(batch["doc_a"]), "b": norm(batch["doc_b"])})


def canonical_cell_batch(batch: pa.Table) -> pa.Table:
    """(source of a, source of b) -> unordered (source_a <= source_b)."""
    import pyarrow.compute as pc

    sa, sb = batch["src_a"], batch["src_b"]
    lo = pc.min_element_wise(sa, sb)
    hi = pc.max_element_wise(sa, sb)
    return pa.table({"source_a": lo, "source_b": hi})


def q_dup_source_matrix(sf_dir: str) -> "object":
    """(source_a, source_b, n_pairs) — unordered source cells."""
    from ray.data.aggregate import Count

    from ..joins import safe_join
    from ..stages.dedup import docs_with_variants, minhash_dedup
    from .queries import _t

    pairs = minhash_dedup(docs_with_variants(sf_dir), threshold_x100=70).map_batches(
        remote_fn(_QD, "normalize_pair_batch"),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    src = _t(sf_dir, "documents", ["doc_id", "source"])
    def _empty():
        import ray.data as rd

        return rd.from_arrow(
            pa.table(
                {
                    "source_a": pa.array([], pa.string()),
                    "source_b": pa.array([], pa.string()),
                    "n_pairs": pa.array([], pa.int64()),
                }
            )
        )

    with_a = safe_join(pairs, src, on=("a",), right_on=("doc_id",))
    if with_a is None:  # no pairs (degenerate corpus)
        return _empty()
    # the join drops the right key column itself; only `source` arrives
    with_a = with_a.rename_columns({"source": "src_a"})
    with_b = safe_join(with_a, src, on=("b",), right_on=("doc_id",))
    if with_b is None:  # same guard: safe_join's materialize fallback
        return _empty()  # returns None on an empty left side
    with_b = with_b.rename_columns({"source": "src_b"})
    return (
        with_b.map_batches(
            remote_fn(_QD, "canonical_cell_batch"),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .groupby(["source_a", "source_b"])
        .aggregate(Count(alias_name="n_pairs"))
    )


def dupmatrix_oracle_sql(pairs_path: str) -> str:
    from ..stages.dedup import VARIANT_OFFSET

    return f"""
WITH norm AS (
  SELECT CASE WHEN doc_a >= {VARIANT_OFFSET}
              THEN doc_a - {VARIANT_OFFSET} ELSE doc_a END AS a,
         CASE WHEN doc_b >= {VARIANT_OFFSET}
              THEN doc_b - {VARIANT_OFFSET} ELSE doc_b END AS b
  FROM read_parquet('{pairs_path}'))
SELECT least(sa.source, sb.source) AS source_a,
       greatest(sa.source, sb.source) AS source_b,
       CAST(count(*) AS BIGINT) AS n_pairs
FROM norm
JOIN documents sa ON sa.doc_id = norm.a
JOIN documents sb ON sb.doc_id = norm.b
GROUP BY 1, 2
"""


DUPMATRIX_QUERIES = {"dup_source_matrix": q_dup_source_matrix}
