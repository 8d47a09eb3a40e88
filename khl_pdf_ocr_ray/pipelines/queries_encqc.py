"""Encoding-anomaly QC (mojibake / control-char / non-ASCII profiling).

A standard web-text hygiene filter: documents with replacement
characters (U+FFFD — the decoder already gave up once), C0 control
bytes, or an abnormal non-ASCII share are demoted before training. The
clean synthetic corpus carries no such signal, so the operator follows
the repo's synthesize-on-read convention (planted URL variants /
planted host edges): a deterministic per-doc variant plants

    (doc_id % 4) U+FFFD replacement chars and
    (doc_id % 3) BEL (0x07) control chars

appended to the text. BOTH engines construct the variant relationally
— what the gate certifies is the vectorized COUNTING (RE2 kernels over
Arrow), not the plant. Scores in exact integer milli-units:

    mojibake_milli = 1000 * (n_repl + n_ctrl) // n_chars_v
    nonascii_milli = 1000 * n_nonascii // n_chars_v

Plan / 100 TB notes: map-only — one variant construction + three RE2
counts per batch (pyarrow count_substring_regex; DuckDB is RE2 too, so
the pattern semantics agree by construction). No exchange at any
scale.

Reference analogue: /root/reference/app.py normalizes cp1251 text but
has no corpus-QC surface; brief scope (text-analysis operators).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

from ..remote import remote_fn

_QE2 = "khl_pdf_ocr_ray.pipelines.queries_encqc"

_REPL = "�"
_CTRL = "\x07"
_RE_REPL = "�"
_RE_CTRL = "[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f]"
_RE_NONASCII = "[^\\x00-\\x7f]"

# the 12 possible planted suffixes, indexed by (doc_id % 4) * 3 + (doc_id % 3)
_SUFFIXES = np.array(
    [_REPL * r + _CTRL * c for r in range(4) for c in range(3)], dtype=object
)


def encqc_batch(batch: pa.Table) -> pa.Table:
    """documents batch -> (doc_id, n_chars_v, n_repl, n_ctrl,
    n_nonascii, mojibake_milli, nonascii_milli), all int64."""
    doc = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    text = pc.fill_null(batch["text"], "")
    idx = (doc % 4) * 3 + (doc % 3)
    suffix = pa.array(_SUFFIXES[idx], pa.string())
    variant = pc.binary_join_element_wise(text, suffix, "")
    n_chars = pc.utf8_length(variant).to_numpy(zero_copy_only=False).astype(
        np.int64
    )
    n_repl = pc.count_substring_regex(variant, _RE_REPL).to_numpy(
        zero_copy_only=False
    ).astype(np.int64)
    n_ctrl = pc.count_substring_regex(variant, _RE_CTRL).to_numpy(
        zero_copy_only=False
    ).astype(np.int64)
    n_na = pc.count_substring_regex(variant, _RE_NONASCII).to_numpy(
        zero_copy_only=False
    ).astype(np.int64)
    denom = np.maximum(n_chars, 1)
    return pa.table(
        {
            "doc_id": pa.array(doc, pa.int64()),
            "n_chars_v": pa.array(n_chars, pa.int64()),
            "n_repl": pa.array(n_repl, pa.int64()),
            "n_ctrl": pa.array(n_ctrl, pa.int64()),
            "n_nonascii": pa.array(n_na, pa.int64()),
            "mojibake_milli": pa.array(
                1000 * (n_repl + n_ctrl) // denom, pa.int64()
            ),
            "nonascii_milli": pa.array(1000 * n_na // denom, pa.int64()),
        }
    )


def q_encoding_qc(sf_dir: str) -> rd.Dataset:
    """Per-doc encoding-anomaly profile. See module docstring."""
    from .queries import _t

    return _t(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        remote_fn(_QE2, "encqc_batch"),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


SQL_ENCODING_QC = """
WITH v AS (
  SELECT doc_id,
         coalesce(text, '')
           || repeat(chr(65533), doc_id % 4)
           || repeat(chr(7), doc_id % 3) AS t
  FROM documents),
c AS (
  SELECT doc_id,
         CAST(length(t) AS BIGINT) AS n_chars_v,
         CAST(len(regexp_extract_all(t, chr(65533))) AS BIGINT) AS n_repl,
         CAST(len(regexp_extract_all(t,
              '[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f]')) AS BIGINT) AS n_ctrl,
         CAST(len(regexp_extract_all(t, '[^\\x00-\\x7f]')) AS BIGINT)
           AS n_nonascii
  FROM v)
SELECT doc_id, n_chars_v, n_repl, n_ctrl, n_nonascii,
       CAST(1000 * (n_repl + n_ctrl) // GREATEST(n_chars_v, 1) AS BIGINT)
         AS mojibake_milli,
       CAST(1000 * n_nonascii // GREATEST(n_chars_v, 1) AS BIGINT)
         AS nonascii_milli
FROM c
"""

ENCQC_QUERIES = {"encoding_qc": q_encoding_qc}
ENCQC_ORACLES = {"encoding_qc": SQL_ENCODING_QC}
