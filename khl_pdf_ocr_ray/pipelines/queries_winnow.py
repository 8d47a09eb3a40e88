"""MOSS winnowing document fingerprints (Schleimer et al. 2003).

``winnow_profile``: per document, the winnowing fingerprint selection
over char 4-gram hashes with window w=8 — for every length-w window of
consecutive k-gram hashes, select the RIGHTMOST minimal hash; the
selected (position, hash) set is the document's fingerprint (the MOSS
guarantee: any shared substring of length >= w + k - 1 shares at least
one selected fingerprint). Output per doc: position count, selected
count, distinct selected hashes, and an exact int64 checksum
``sum(pos * h)`` over the selected set that pins the precise selection
(positions AND hashes) without shipping it.

Why a profile and not shared-fingerprint pairs: the synthetic corpus'
31-word vocab makes char-gram fingerprints globally common — every doc
would pair with every other (the documented degeneracy, see
source_overlap_matrix) — so the oracle gates the exact selection
algorithm per doc; the pair step at deployment is the minhash band
pattern (groupby h -> bounded pair emit) already certified elsewhere.

Hash: 4-char polynomial (base 257, < 2^33) mixed by the repo-wide
Knuth constant mod 2^32. numpy uint64 wraparound == DuckDB HUGEINT
because mod 2^64 preserves mod 2^32 (the shard_resize_moves
convention, proven bit-for-bit there).

Plan / 100 TB notes: map-ONLY — text never leaves the scan, no
exchange at all; per-doc work is numpy sliding-window kernels
(O(len * w) worst case, len ~ doc chars). The output is
doc-cardinality slim rows.

Oracle: static SQL — per-char unnest + positional self-join builds the
same 4-gram hashes; a frame window min + argmax-position join performs
the same rightmost-min selection.

Reference analogue: /root/reference/app.py has no fingerprint surface;
brief scope (document fingerprinting as a first-class dedup family).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..remote import remote_fn

_QW = "khl_pdf_ocr_ray.pipelines.queries_winnow"

WIN_K = 4  # k-gram length (chars)
WIN_W = 8  # winnowing window (hashes)
WIN_MULT = 2654435761  # Knuth multiplicative constant (repo-wide)
WIN_SPACE = 1 << 32
_B1, _B2, _B3 = 257**3, 257**2, 257


def winnow_doc(codes: np.ndarray) -> tuple:
    """One doc's char codes -> (npos, sel_pos (1-indexed), sel_h).
    Rightmost-min per window; whole-sequence window when npos < w."""
    n = len(codes)
    assert n >= WIN_K, "caller filters docs shorter than the k-gram"
    c = codes.astype(np.uint64)
    poly = (
        c[: n - 3] * np.uint64(_B1)
        + c[1 : n - 2] * np.uint64(_B2)
        + c[2 : n - 1] * np.uint64(_B3)
        + c[3:]
    )
    # wraparound mod 2^64 preserves mod 2^32 (2^32 | 2^64)
    h = (poly * np.uint64(WIN_MULT)) % np.uint64(WIN_SPACE)
    npos = n - WIN_K + 1
    if npos <= WIN_W:
        sel = np.array([npos - 1 - int(np.argmin(h[::-1]))], dtype=np.int64)
    else:
        wins = np.lib.stride_tricks.sliding_window_view(h, WIN_W)
        # argmin of the reversed window = rightmost minimum
        idx = WIN_W - 1 - np.argmin(wins[:, ::-1], axis=1)
        sel = np.unique(np.arange(len(wins), dtype=np.int64) + idx)
    return npos, sel + 1, h[sel].astype(np.int64)


def winnow_profile_batch(batch: pa.Table) -> pa.Table:
    """documents batch -> per-doc winnowing profile rows."""
    out = {
        "doc_id": [],
        "n_positions": [],
        "n_selected": [],
        "n_distinct": [],
        "sel_checksum": [],
    }
    for did, text in zip(
        batch["doc_id"].to_pylist(), batch["text"].to_pylist()
    ):
        t = text or ""
        assert t.isascii(), "winnow hash defined over ASCII codepoints"
        if len(t) < WIN_K:
            continue
        codes = np.frombuffer(t.encode("ascii"), dtype=np.uint8)
        npos, pos, hs = winnow_doc(codes)
        # pos <= npos < 2^10 and h < 2^32: products < 2^42, sums < 2^52
        out["doc_id"].append(int(did))
        out["n_positions"].append(int(npos))
        out["n_selected"].append(len(pos))
        out["n_distinct"].append(int(len(np.unique(hs))))
        out["sel_checksum"].append(int(np.sum(pos * hs)))
    return pa.table(
        {
            "doc_id": pa.array(out["doc_id"], pa.int64()),
            "n_positions": pa.array(out["n_positions"], pa.int64()),
            "n_selected": pa.array(out["n_selected"], pa.int64()),
            "n_distinct": pa.array(out["n_distinct"], pa.int64()),
            "sel_checksum": pa.array(out["sel_checksum"], pa.int64()),
        }
    )


def q_winnow_profile(sf_dir: str) -> "object":
    """(doc_id, n_positions, n_selected, n_distinct, sel_checksum)."""
    from .queries import _t

    return _t(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        remote_fn(_QW, "winnow_profile_batch"),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


SQL_WINNOW_PROFILE = f"""
WITH ch AS (
  SELECT doc_id,
         unnest(string_split(text, '')) AS c,
         generate_subscripts(string_split(text, ''), 1) AS i
  FROM documents WHERE length(text) >= {WIN_K}),
g AS (
  SELECT a.doc_id, a.i AS p,
         CAST(((ascii(a.c) * {_B1} + ascii(b.c) * {_B2}
                + ascii(c2.c) * {_B3} + ascii(d.c))::HUGEINT
               * {WIN_MULT}) % {WIN_SPACE} AS BIGINT) AS h
  FROM ch a
  JOIN ch b  ON b.doc_id = a.doc_id AND b.i = a.i + 1
  JOIN ch c2 ON c2.doc_id = a.doc_id AND c2.i = a.i + 2
  JOIN ch d  ON d.doc_id = a.doc_id AND d.i = a.i + 3),
nps AS (SELECT doc_id, max(p) AS npos FROM g GROUP BY doc_id),
w1 AS (
  SELECT doc_id, p AS s,
         min(h) OVER (PARTITION BY doc_id ORDER BY p
                      ROWS BETWEEN CURRENT ROW
                      AND {WIN_W - 1} FOLLOWING) AS wmin
  FROM g),
ws AS (
  SELECT w1.doc_id, w1.s, w1.wmin
  FROM w1 JOIN nps ON nps.doc_id = w1.doc_id
  WHERE w1.s <= greatest(nps.npos - {WIN_W - 1}, 1)),
sel AS (
  SELECT ws.doc_id, ws.s, ws.wmin, max(g.p) AS selp
  FROM ws JOIN g ON g.doc_id = ws.doc_id
   AND g.p BETWEEN ws.s AND ws.s + {WIN_W - 1} AND g.h = ws.wmin
  GROUP BY ws.doc_id, ws.s, ws.wmin),
dsel AS (SELECT DISTINCT doc_id, selp, wmin FROM sel)
SELECT d.doc_id,
       nps.npos AS n_positions,
       CAST(count(*) AS BIGINT) AS n_selected,
       CAST(count(DISTINCT d.wmin) AS BIGINT) AS n_distinct,
       CAST(sum(d.selp * d.wmin) AS BIGINT) AS sel_checksum
FROM dsel d JOIN nps ON nps.doc_id = d.doc_id
GROUP BY d.doc_id, nps.npos
"""

WINNOW_QUERIES = {"winnow_profile": q_winnow_profile}
WINNOW_ORACLES = {"winnow_profile": SQL_WINNOW_PROFILE}
