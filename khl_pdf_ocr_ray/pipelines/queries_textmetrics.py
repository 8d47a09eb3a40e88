"""Readability scoring (Flesch reading-ease, integer fixed point).

A standard document-quality signal for training-data curation (used
alongside the Gopher/CCNet filters): Flesch reading ease from three
surface counts —

  words      = space-split token count (the module-wide corpus
               tokenization contract: ``split(' ')`` == DuckDB
               ``string_split``, empties included),
  sentences  = number of terminator RUNS ``[.!?]+`` (min 1),
  syllables  = number of vowel GROUPS ``[aeiouy]+`` in the lowercased
               text (the classic one-pass syllable heuristic).

Score in exact integer milli-units so both engines hash identically:

  fre_milli = 206835 - (1015 * words) // sentences
                     - (84600 * syllables) // words

(all divisions over non-negative ints — DuckDB ``//`` truncates on
negatives, so the formula keeps every dividend >= 0).

Plan: map-only — three vectorized RE2/Arrow counts per batch, no
exchange at any scale. The synthetic gate corpus has no sentence
punctuation (31-word vocabulary), so the sentence term degenerates to
min=1 there; the punctuated path is held by the pytest fixtures
(tests/test_round4b_ops.py), the word/syllable terms vary per doc and
the gate certifies the full integer formula.

Reference analogue: /root/reference/app.py has no quality-scoring
surface; brief scope (text-analysis operators over documents).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

from ..remote import remote_fn

_QR = "khl_pdf_ocr_ray.pipelines.queries_textmetrics"


def readability_batch(batch: pa.Table) -> pa.Table:
    """One documents batch -> (doc_id, n_words, n_sentences,
    n_syllables, fre_milli), all int64."""
    text = pc.fill_null(batch["text"], "")
    words = pc.list_value_length(pc.split_pattern(text, " ")).to_numpy(
        zero_copy_only=False
    ).astype(np.int64)
    sent_runs = pc.count_substring_regex(text, "[.!?]+").to_numpy(
        zero_copy_only=False
    ).astype(np.int64)
    syl = pc.count_substring_regex(
        pc.utf8_lower(text), "[aeiouy]+"
    ).to_numpy(zero_copy_only=False).astype(np.int64)
    sentences = np.maximum(sent_runs, 1)
    # split(' ') always yields >= 1 token, so words >= 1: division-safe
    fre = 206_835 - (1015 * words) // sentences - (84_600 * syl) // words
    return pa.table(
        {
            "doc_id": batch["doc_id"].cast(pa.int64()),
            "n_words": pa.array(words, pa.int64()),
            "n_sentences": pa.array(sentences, pa.int64()),
            "n_syllables": pa.array(syl, pa.int64()),
            "fre_milli": pa.array(fre, pa.int64()),
        }
    )


def q_readability(sf_dir: str) -> rd.Dataset:
    """Per-doc Flesch reading ease. See module docstring."""
    from .queries import _t

    return _t(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        remote_fn(_QR, "readability_batch"),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


SQL_READABILITY = """
WITH s AS (
  SELECT doc_id,
         CAST(len(string_split(coalesce(text, ''), ' ')) AS BIGINT) AS w,
         CAST(GREATEST(1, len(regexp_extract_all(coalesce(text, ''),
                                                 '[.!?]+'))) AS BIGINT)
           AS sen,
         CAST(len(regexp_extract_all(lower(coalesce(text, '')),
                                     '[aeiouy]+')) AS BIGINT) AS syl
  FROM documents)
SELECT doc_id,
       w AS n_words,
       sen AS n_sentences,
       syl AS n_syllables,
       CAST(206835 - (1015 * w) // sen - (84600 * syl) // w AS BIGINT)
         AS fre_milli
FROM s
"""

TEXTMETRICS_QUERIES = {"readability_score": q_readability}
TEXTMETRICS_ORACLES = {"readability_score": SQL_READABILITY}
