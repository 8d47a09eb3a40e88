"""Multi-pattern dictionary tagging (substring scan over documents).

``dictionary_tag``: for every pattern in a fixed dictionary (single
words, multi-word phrases, and absent probes), the number of documents
containing it and the total non-overlapping occurrence count — the
blocklist/PII/keyword-tagging scan shape (FlashText/Aho-Corasick class).
Occurrence semantics are left-to-right NON-overlapping, identical in
pyarrow's ``count_substring`` and DuckDB's replace-length arithmetic
(parity checked on the 'aa' in 'aaa' overlap case).

Plan / 100 TB notes: map-only — one vectorized ``pc.count_substring``
sweep per pattern per batch (text never leaves the scan); per-batch
(pattern, n_docs, n_occ) partials fold through ONE dictionary-sized Sum
exchange. This vectorized per-pattern form is right for config-sized
dictionaries; a 10^5-pattern dictionary moves to an Aho-Corasick
automaton built ONCE per actor (`__init__`, the D2 actor-pool pattern)
with the same output contract — documented, not built (no such
dictionary exists in this corpus).

Oracle: static SQL — one UNION ALL leg per pattern with
``(length(t) - length(replace(t, pat, ''))) // length(pat)``.

Reference analogue: the reference's header-substring tests
(app.py:198, 247, 281) are single-pattern membership scans; this is
the dictionary-scale generalization.
"""

from __future__ import annotations

import pyarrow as pa

from ..remote import remote_fn

_QD = "khl_pdf_ocr_ray.pipelines.queries_dict"

# fixed dictionary: present words, a phrase, substrings crossing word
# boundaries, and an absent probe (zero-row semantics on both sides)
DICT_PATTERNS = (
    "data",
    "row",
    "column",
    "data row",
    "a r",
    "zz-absent-zz",
)


def dict_tag_partial(batch: pa.Table) -> pa.Table:
    """documents batch -> (pattern, n_docs, n_occ) partials."""
    import pyarrow.compute as pc

    text = pc.coalesce(batch["text"], "")
    pats, docs, occ = [], [], []
    for pat in DICT_PATTERNS:
        c = pc.count_substring(text, pat)
        pats.append(pat)
        docs.append(pc.sum(pc.cast(pc.greater(c, 0), pa.int64())).as_py() or 0)
        occ.append(pc.sum(pc.cast(c, pa.int64())).as_py() or 0)
    return pa.table(
        {
            "pattern": pa.array(pats, pa.string()),
            "n_docs": pa.array(docs, pa.int64()),
            "n_occ": pa.array(occ, pa.int64()),
        }
    )


def q_dictionary_tag(sf_dir: str) -> "object":
    """(pattern, n_docs, n_occ) — zero-hit patterns present with 0s."""
    from ray.data.aggregate import Sum

    from .queries import _t

    return (
        _t(sf_dir, "documents", ["text"])
        .map_batches(
            remote_fn(_QD, "dict_tag_partial"),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .groupby("pattern")
        .aggregate(
            Sum("n_docs", alias_name="n_docs"),
            Sum("n_occ", alias_name="n_occ"),
        )
    )


def _leg(pat: str) -> str:
    esc = pat.replace("'", "''")
    return f"""
SELECT '{esc}' AS pattern,
       CAST(count(*) FILTER (WHERE occ > 0) AS BIGINT) AS n_docs,
       CAST(coalesce(sum(occ), 0) AS BIGINT) AS n_occ
FROM (SELECT (length(coalesce(text, ''))
              - length(replace(coalesce(text, ''), '{esc}', '')))
             // length('{esc}') AS occ
      FROM documents)"""


SQL_DICTIONARY_TAG = "\nUNION ALL\n".join(_leg(p) for p in DICT_PATTERNS)

DICT_QUERIES = {"dictionary_tag": q_dictionary_tag}
DICT_ORACLES = {"dictionary_tag": SQL_DICTIONARY_TAG}
