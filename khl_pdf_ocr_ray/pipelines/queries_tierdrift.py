"""Quality-tier drift across crawl snapshots (tier transition matrix).

The recrawl companion to doc_tiers: as pages get re-crawled, boilerplate
accretes and quality tiers drift — the matrix of (tier at crawl s ->
tier at crawl s+1) counts is the report a corpus curator reads before
deciding re-tiering cadence. Snapshots follow THE scd2 synthetic-crawl
convention (a doc changes at snapshot s >= 1 iff (doc_id + s) % 3 == 0,
revisions accumulate); each revision appends FILLER_K copies of the
token ``the`` — boilerplate accretion that raises the top-term
repetition signal and demotes tiers through the certified doc_tiers
thresholds.

The key trick: the snapshot text is NEVER materialized. Appending m
filler tokens shifts the tier signals in closed form —

  n_words_s = n_words + m
  max_cnt_s = max(max_cnt, count('the') + m),    m = rev_s * FILLER_K
  rep_s     = 1000 * max_cnt_s // n_words_s

so one vectorized pass computes all |SNAPS| tiers per doc from the
base counts (the tier_batch kernel family), and transitions reduce to
a <= 9-cell combiner. Output: (tier_from, tier_to, n) over all
consecutive snapshot pairs.

Plan / 100 TB notes: map-only + ONE 9-group exchange; the text never
shuffles and never gets copied per snapshot (a naive plan would blow
the corpus up |SNAPS|x before tiering).

Oracle: static SQL — the same closed-form signal shift over a
documents x snapshots grid (windowed revision cumsum, GREATEST, the
doc_tiers CASE thresholds), transitions via a snap+1 self-join.

Reference analogue: /root/reference/app.py has no recrawl surface;
brief scope (tier extraction — the graft's headline — over time).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.arrowkit import select_rename
from ..remote import remote_fn

_QTD = "khl_pdf_ocr_ray.pipelines.queries_tierdrift"

# THE scd2 synthetic-crawl convention (queries_eval.SCD_SNAPS/SCD_CHG_MOD
# own the values; literals here because importing .queries_eval at module
# body would be circular once registered — pinned by
# tests/test_round4d_ops.py::test_tierdrift_constants_match_scd2).
DRIFT_SNAPS = 4
DRIFT_CHG_MOD = 3
FILLER_TOKEN = "the"
FILLER_K = 8  # filler tokens appended per revision

# tier thresholds: queries_tiers owns them; imported lazily in kernels
# (queries_tiers has no import-time dependency on queries, so a direct
# module-body import would be safe — kept lazy for uniformity).


def tier_from_signals(n_words: np.ndarray, rep: np.ndarray) -> np.ndarray:
    from .queries_tiers import (
        TIER1_MAX_REP,
        TIER1_MIN_WORDS,
        TIER2_MAX_REP,
        TIER2_MIN_WORDS,
    )

    tier = np.zeros(len(n_words), dtype=np.int64)
    tier[(n_words >= TIER1_MIN_WORDS) & (rep <= TIER1_MAX_REP)] = 1
    tier[(n_words >= TIER2_MIN_WORDS) & (rep <= TIER2_MAX_REP)] = 2
    return tier


def tier_drift_partial(batch: pa.Table) -> pa.Table:
    """documents batch -> (tier_from, tier_to, n) transition partials
    over all consecutive snapshot pairs, via the closed-form signal
    shift (no snapshot text materialized)."""
    text = pc.fill_null(batch["text"], "")
    toks = pc.split_pattern(text, " ")
    n_words = (
        pc.list_value_length(toks)
        .to_numpy(zero_copy_only=False)
        .astype(np.int64)
    )
    flat = pc.list_flatten(toks).combine_chunks()
    parent = (
        pc.list_parent_indices(toks)
        .to_numpy(zero_copy_only=False)
        .astype(np.int64)
    )
    enc = pc.dictionary_encode(flat)
    if isinstance(enc, pa.ChunkedArray):
        enc = enc.combine_chunks()
    codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    vocab = enc.dictionary.to_pylist()
    v = max(1, len(vocab))
    uk, cnt = np.unique(parent * v + codes, return_counts=True)
    doc_pos = uk // v
    max_cnt = np.zeros(len(batch), dtype=np.int64)
    np.maximum.at(max_cnt, doc_pos, cnt)
    # per-doc count of the filler token
    the_cnt = np.zeros(len(batch), dtype=np.int64)
    try:
        the_code = vocab.index(FILLER_TOKEN)
        m = uk % v == the_code
        the_cnt[doc_pos[m]] = cnt[m]
    except ValueError:
        pass  # filler token absent from this batch's vocab
    doc = batch["doc_id"].cast(pa.int64()).to_numpy(zero_copy_only=False)
    # revision count at snapshot s: |{s' in 1..s : (doc+s') % MOD == 0}|
    tiers = []
    rev = np.zeros(len(batch), dtype=np.int64)
    for s in range(DRIFT_SNAPS):
        if s >= 1:
            rev = rev + ((doc + s) % DRIFT_CHG_MOD == 0).astype(np.int64)
        m = rev * FILLER_K
        nw = n_words + m
        mx = np.maximum(max_cnt, the_cnt + m)
        rep = 1000 * mx // np.maximum(nw, 1)
        tiers.append(tier_from_signals(nw, rep))
    pairs = {}
    for s in range(DRIFT_SNAPS - 1):
        key = tiers[s] * 3 + tiers[s + 1]
        up, n = np.unique(key, return_counts=True)
        for k, c in zip(up, n):
            pairs[int(k)] = pairs.get(int(k), 0) + int(c)
    keys = sorted(pairs)
    return pa.table(
        {
            "tier_from": pa.array([k // 3 for k in keys], pa.int64()),
            "tier_to": pa.array([k % 3 for k in keys], pa.int64()),
            "n": pa.array([pairs[k] for k in keys], pa.int64()),
        }
    )


def q_tier_transitions(sf_dir: str) -> "object":
    """(tier_from, tier_to, n). See module docstring."""
    from ray.data.aggregate import Sum

    from .queries import _t

    return (
        _t(sf_dir, "documents", ["doc_id", "text"])
        .map_batches(
            remote_fn(_QTD, "tier_drift_partial"),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .groupby(["tier_from", "tier_to"])
        .aggregate(Sum("n", alias_name="n"))
    )


def _sql_tier_transitions() -> str:
    from .queries_tiers import (
        TIER1_MAX_REP,
        TIER1_MIN_WORDS,
        TIER2_MAX_REP,
        TIER2_MIN_WORDS,
    )

    return f"""
WITH counts AS (
  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS c
  FROM (SELECT doc_id,
               unnest(string_split(coalesce(text, ''), ' ')) AS term
        FROM documents)
  GROUP BY doc_id, term),
base AS (
  SELECT doc_id, max(c) AS mx, sum(c) AS nw,
         coalesce(max(CASE WHEN term = '{FILLER_TOKEN}' THEN c END), 0)
           AS thec
  FROM counts GROUP BY doc_id),
s AS (SELECT CAST(i AS BIGINT) AS snap FROM range({DRIFT_SNAPS}) t(i)),
obs AS (
  SELECT b.doc_id, s.snap, b.mx, b.nw, b.thec,
         CAST(SUM(CASE WHEN s.snap >= 1
                        AND (b.doc_id + s.snap) % {DRIFT_CHG_MOD} = 0
                       THEN 1 ELSE 0 END)
              OVER (PARTITION BY b.doc_id ORDER BY s.snap) AS BIGINT)
           AS rev
  FROM base b CROSS JOIN s),
sig AS (
  SELECT doc_id, snap,
         nw + rev * {FILLER_K} AS nws,
         (1000 * GREATEST(mx, thec + rev * {FILLER_K}))
           // GREATEST(nw + rev * {FILLER_K}, 1) AS rep
  FROM obs),
tiered AS (
  SELECT doc_id, snap,
         CAST(CASE
           WHEN nws >= {TIER2_MIN_WORDS} AND rep <= {TIER2_MAX_REP} THEN 2
           WHEN nws >= {TIER1_MIN_WORDS} AND rep <= {TIER1_MAX_REP} THEN 1
           ELSE 0 END AS BIGINT) AS tier
  FROM sig)
SELECT a.tier AS tier_from, b.tier AS tier_to,
       CAST(count(*) AS BIGINT) AS n
FROM tiered a JOIN tiered b
  ON a.doc_id = b.doc_id AND b.snap = a.snap + 1
GROUP BY a.tier, b.tier
"""


TIERDRIFT_QUERIES = {"tier_transitions": q_tier_transitions}
TIERDRIFT_ORACLES = {"tier_transitions": _sql_tier_transitions()}
