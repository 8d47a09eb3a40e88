"""Text-analysis operators: language-ID, quality metrics, token stats,
fingerprints (the training-data-pipeline additions the build brief names).

Every operator is a vectorized ``map_batches`` body (pandas .str kernels
with module-compiled regexes) plus a query fn and a DuckDB oracle. The
deterministic twin constraint shapes the design:

- patterns avoid ``\\b`` (RE2's word boundary is ASCII-only; Python's is
  Unicode-aware) — stopword hits use explicit space delimiters instead, so
  DuckDB's regexp_extract_all and pandas .str.count agree exactly;
- ratios are exported as integer fixed-point (floor), never floats;
- argmax tie-break is alphabetical on the language code in both engines.
"""

from __future__ import annotations

import hashlib
import re
from typing import Dict, List

import numpy as np
import pandas as pd
import pyarrow as pa

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


_COMPILED_STOPS = {lang: re.compile(_stop_pattern(ws)) for lang, ws in STOPWORDS.items()}
_RE_TOKEN = re.compile(r"\S+")
_RE_WS = re.compile(r"\s+")
_RE_BPE = re.compile(r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]")

ROLL_BASE = 1_000_003
ROLL_MOD = (1 << 61) - 1


# --- batch bodies (wired via remote_fn) -------------------------------------
def lang_id_batch(df: pd.DataFrame) -> pd.DataFrame:
    """Stopword-count language ID. Vectorized: one .str.count per language.
    pred = argmax; ties -> alphabetically first; all-zero -> 'und'."""
    low = df["text"].fillna("").str.lower()
    counts = {lang: low.str.count(_COMPILED_STOPS[lang]) for lang in LANGS}
    mat = np.stack([counts[lang].to_numpy() for lang in LANGS], axis=1)
    best = mat.argmax(axis=1)  # first max wins = alphabetical tie-break
    pred = np.array(LANGS, dtype=object)[best]
    pred[mat.max(axis=1) == 0] = "und"
    return pd.DataFrame({"doc_id": df["doc_id"], "pred_lang": pred})


def lang_confusion_partial(df: pd.DataFrame) -> pd.DataFrame:
    """Per-batch (declared lang, predicted lang) count combiner — the
    model-evaluation confusion matrix over the lang-ID predictor; the
    downstream groupby moves <= |langs|^2 rows per block."""
    pred = lang_id_batch(df)["pred_lang"].to_numpy()
    g = (
        pd.DataFrame({"lang": df["lang"], "pred_lang": pred})
        .groupby(["lang", "pred_lang"], as_index=False)
        .size()
        .rename(columns={"size": "n"})
    )
    return g.astype({"n": "int64"})


def quality_batch(df: pd.DataFrame) -> pd.DataFrame:
    """Per-doc quality metrics, all integers."""
    text = df["text"].fillna("")
    tokens = text.str.findall(_RE_TOKEN)
    n_tokens = tokens.str.len().astype("int64")
    n_types = tokens.map(lambda ts: len(set(ts))).astype("int64")
    n_solid = text.str.replace(_RE_WS, "", regex=True).str.len().astype("int64")
    avg_len = np.where(n_tokens > 0, (100 * n_solid) // n_tokens.clip(lower=1), 0)
    return pd.DataFrame(
        {
            "doc_id": df["doc_id"],
            "n_tokens": n_tokens,
            "n_types": n_types,
            "n_solid_chars": n_solid,
            "avg_token_len_x100": avg_len.astype("int64"),
        }
    )


def token_stats_batch(df: pd.DataFrame) -> pd.DataFrame:
    """Partial per-batch token totals per lang (combiner pattern: the
    groupby downstream only moves one row per (lang, batch))."""
    text = df["text"].fillna("")
    ws = text.str.count(_RE_TOKEN).astype("int64")
    bpe = text.str.count(_RE_BPE).astype("int64")
    g = pd.DataFrame({"lang": df["lang"], "ws": ws, "bpe": bpe}).groupby(
        "lang", as_index=False
    )
    out = g.agg(n_docs=("ws", "size"), ws_tokens=("ws", "sum"), bpe_tokens=("bpe", "sum"))
    return out


def fingerprint_batch(df: pd.DataFrame) -> pd.DataFrame:
    """md5 of whitespace-normalized lowercase text (SQL-checkable) plus a
    Rabin-Karp rolling hash (the non-SQL fingerprint)."""
    norm = (
        df["text"].fillna("").str.lower().str.replace(_RE_WS, " ", regex=True).str.strip()
    )
    fp_md5 = norm.map(lambda s: hashlib.md5(s.encode("utf-8")).hexdigest())
    fp_roll = norm.map(_rolling_hash)
    return pd.DataFrame(
        {"doc_id": df["doc_id"], "fp_md5": fp_md5, "fp_roll": fp_roll.astype("int64")}
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
