"""Text-analysis operators: language-ID, quality metrics, token stats,
fingerprints (the training-data-pipeline additions the build brief names).

Every operator is a vectorized ``map_batches`` body (Arrow RE2 kernels —
``pyarrow.compute.count_substring_regex`` / ``replace_substring_regex`` —
over zero-copy pyarrow batches) plus a query fn and a DuckDB oracle. The
deterministic twin constraint shapes the design:

- both engines now run the SAME regex engine (RE2): DuckDB's
  regexp_extract_all and Arrow's count_substring_regex agree by
  construction. Patterns avoid ``\\b`` (RE2's word boundary is
  ASCII-only) — stopword hits use explicit space delimiters;
- ratios are exported as integer fixed-point (floor), never floats;
- argmax tie-break is alphabetical on the language code in both engines.
"""

from __future__ import annotations

import hashlib
import re
from typing import Dict, List

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# language stopword sets; alphabetical lang order defines the tie-break
STOPWORDS: Dict[str, List[str]] = {
    "de": ["der", "die", "und", "das", "ist"],
    "en": ["the", "and", "of", "to", "in"],
    "es": ["el", "los", "que", "por", "una"],
    "fr": ["le", "la", "et", "les", "des"],
    "ru": ["и", "в", "не", "на", "что"],
}
LANGS = sorted(STOPWORDS)


def _stop_pattern(words: List[str]) -> str:
    alt = "|".join(words)
    return f"(^| )({alt})( |$)"


# python-re compiled twins kept for kernel-level tests / sequential use
_COMPILED_STOPS = {lang: re.compile(_stop_pattern(ws)) for lang, ws in STOPWORDS.items()}
_RE_TOKEN = r"\S+"
_RE_WS = r"\s+"
_RE_BPE = r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]"

ROLL_BASE = 1_000_003
ROLL_MOD = (1 << 61) - 1


def _filled(batch: pa.Table, col: str = "text"):
    return pc.fill_null(batch[col], "")


# --- batch bodies (wired via remote_fn) -------------------------------------
def lang_id_pred(batch: pa.Table) -> np.ndarray:
    """Stopword-count language ID, shared by lang_id and the confusion
    combiner. One RE2 count per language; argmax with alphabetical
    tie-break; all-zero -> 'und'."""
    low = pc.utf8_lower(_filled(batch))
    mat = np.stack(
        [
            pc.count_substring_regex(low, _stop_pattern(STOPWORDS[lang]))
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
            for lang in LANGS
        ],
        axis=1,
    )
    best = mat.argmax(axis=1)  # first max wins = alphabetical tie-break
    pred = np.array(LANGS, dtype=object)[best]
    pred[mat.max(axis=1) == 0] = "und"
    return pred


def lang_id_batch(batch: pa.Table) -> pa.Table:
    return pa.table(
        {"doc_id": batch["doc_id"], "pred_lang": pa.array(lang_id_pred(batch), pa.string())}
    )


def lang_confusion_partial(batch: pa.Table) -> pa.Table:
    """Per-batch (declared lang, predicted lang) count combiner — the
    model-evaluation confusion matrix over the lang-ID predictor; the
    downstream groupby moves <= |langs|^2 rows per block."""
    pred = lang_id_pred(batch)
    t = pa.table(
        {"lang": batch["lang"], "pred_lang": pa.array(pred, pa.string())}
    )
    g = t.group_by(["lang", "pred_lang"]).aggregate([("pred_lang", "count")])
    from ..functions.arrowkit import select_rename

    return select_rename(g, lang="lang", pred_lang="pred_lang", n="pred_lang_count")


def quality_batch(batch: pa.Table) -> pa.Table:
    """Per-doc quality metrics, all integers. Counts/lengths are Arrow RE2
    kernels; the distinct-type count is the one inherently per-doc set
    operation (Python over the token lists)."""
    text = _filled(batch)
    n_tokens = (
        pc.count_substring_regex(text, _RE_TOKEN)
        .to_numpy(zero_copy_only=False)
        .astype(np.int64)
    )
    n_solid = (
        pc.utf8_length(pc.replace_substring_regex(text, r"\s", ""))
        .to_numpy(zero_copy_only=False)
        .astype(np.int64)
    )
    n_types = np.array(
        [len(set((t or "").split())) for t in text.to_pylist()], dtype=np.int64
    )
    avg_len = np.where(n_tokens > 0, (100 * n_solid) // np.maximum(n_tokens, 1), 0)
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "n_tokens": n_tokens,
            "n_types": n_types,
            "n_solid_chars": n_solid,
            "avg_token_len_x100": avg_len.astype(np.int64),
        }
    )


def token_stats_batch(batch: pa.Table) -> pa.Table:
    """Partial per-batch token totals per lang (combiner pattern: the
    groupby downstream only moves one row per (lang, batch))."""
    text = _filled(batch)
    t = pa.table(
        {
            "lang": batch["lang"],
            "ws": pc.cast(pc.count_substring_regex(text, _RE_TOKEN), pa.int64()),
            "bpe": pc.cast(pc.count_substring_regex(text, _RE_BPE), pa.int64()),
        }
    )
    g = t.group_by(["lang"]).aggregate(
        [("ws", "count"), ("ws", "sum"), ("bpe", "sum")]
    )
    from ..functions.arrowkit import select_rename

    return select_rename(
        g, lang="lang", n_docs="ws_count", ws_tokens="ws_sum", bpe_tokens="bpe_sum"
    )


def fingerprint_batch(batch: pa.Table) -> pa.Table:
    """md5 of whitespace-normalized lowercase text (SQL-checkable) plus a
    Rabin-Karp rolling hash (the non-SQL fingerprint). Normalization is
    Arrow RE2; the digests are the inherent per-doc byte loops."""
    norm = pc.utf8_trim_whitespace(
        pc.replace_substring_regex(pc.utf8_lower(_filled(batch)), _RE_WS, " ")
    ).to_pylist()
    fp_md5 = [hashlib.md5(s.encode("utf-8")).hexdigest() for s in norm]
    fp_roll = np.array([_rolling_hash(s) for s in norm], dtype=np.int64)
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "fp_md5": pa.array(fp_md5, pa.string()),
            "fp_roll": fp_roll,
        }
    )


def _rolling_hash(s: str) -> int:
    h = 0
    for b in s.encode("utf-8"):
        h = (h * ROLL_BASE + b) % ROLL_MOD
    return h


# --- oracle SQL builders ----------------------------------------------------
def sql_lang_id() -> str:
    count_cols = ",\n    ".join(
        f"len(regexp_extract_all(lower(text), '{_stop_pattern(STOPWORDS[lang])}')) AS c_{lang}"
        for lang in LANGS
    )
    greatest = f"GREATEST({', '.join('c_' + lang for lang in LANGS)})"
    case = " ".join(f"WHEN c_{lang} = m THEN '{lang}'" for lang in LANGS)
    return f"""
WITH c AS (
  SELECT doc_id,
    {count_cols}
  FROM documents
), g AS (SELECT *, {greatest} AS m FROM c)
SELECT doc_id, CASE WHEN m = 0 THEN 'und' {case} END AS pred_lang FROM g
"""


SQL_TEXT_QUALITY = r"""
SELECT doc_id,
  CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_tokens,
  CAST(len(list_distinct(regexp_extract_all(text, '\S+'))) AS BIGINT) AS n_types,
  CAST(len(regexp_replace(text, '\s', '', 'g')) AS BIGINT) AS n_solid_chars,
  CAST(CASE WHEN len(regexp_extract_all(text, '\S+')) > 0
       THEN 100 * len(regexp_replace(text, '\s', '', 'g'))
            // len(regexp_extract_all(text, '\S+'))
       ELSE 0 END AS BIGINT) AS avg_token_len_x100
FROM documents
"""

SQL_TOKEN_STATS = r"""
SELECT lang,
  CAST(count(*) AS BIGINT) AS n_docs,
  CAST(sum(len(regexp_extract_all(text, '\S+'))) AS BIGINT) AS ws_tokens,
  CAST(sum(len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]'))) AS BIGINT) AS bpe_tokens
FROM documents GROUP BY lang
"""

SQL_FINGERPRINT = r"""
SELECT doc_id, md5(trim(regexp_replace(lower(coalesce(text, '')), '\s+', ' ', 'g'))) AS fp_md5
FROM documents
"""
