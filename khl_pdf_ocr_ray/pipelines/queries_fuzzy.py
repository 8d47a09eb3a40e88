"""Fuzzy master-name canonicalization (broadcast hamming-1 join).

``master_fuzzy_match``: canonicalize extracted referee/goalie names
against the master side tables under a substitution-noise model — the
classic OCR confusion е→ё is applied to every extracted name (first
occurrence; names without 'е' pass through unchanged), and each noisy
name is matched to the master name of the same kind and SAME character
length at char-Hamming distance <= 1, tie-broken by (distance, name).
This extends the exact broadcast validation (``master_validate``,
SURVEY.md §2.4 J1) to the fuzzy-lookup case a real OCR stream needs.

Why Hamming, not Levenshtein: the noise model is substitution-only, so
the equal-length Hamming-1 ball IS the match set — and it is exactly
SQL-expressible per character (DuckDB's ``levenshtein`` is byte-based on
UTF-8 Cyrillic, measured: 'Петров'→'Пётров' = 2 bytes, while 'о'→'е' =
1 byte — byte metrics invert the ranking, so neither side uses them).
The general edit-distance paths live in snm_dups / fuzzy_prefix_dups.

Plan / 100 TB notes: extracted names reduce to DISTINCT (kind, name)
first (per-batch distinct partial + one slim groupby — rows ~ name
vocabulary, never documents); the master pool is broadcast ONCE via
ray.put as {(kind, char_len): sorted names} so the fuzzy probe is
map-side — no shuffle join anywhere. Equal-length blocking bounds each
probe to one bucket; per-bucket compare is a numpy codepoint matrix.

Oracle: dump-backed — the sequential extraction dump's names, the same
perturbation (regexp_replace first-occurrence), and a positional
substr() compare reproduce the distance in pure SQL.

Reference analogue: /root/reference/ master CSVs (referees_master.csv,
players_master.csv) as the canonical-name side data; app.py never joins
them (SURVEY.md §2.4) — this is the engine-side capability they imply.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np
import pyarrow as pa

from ..remote import remote_fn

_QF = "khl_pdf_ocr_ray.pipelines.queries_fuzzy"

_NAME_COLS = (
    ("ref_main", "referee"),
    ("ref_linesmen", "referee"),
    ("gk_home_names", "goalie"),
    ("gk_away_names", "goalie"),
)


def perturb(name: str) -> str:
    """The substitution-noise model: first 'е' -> 'ё' (OCR confusion)."""
    return name.replace("е", "ё", 1)


def explode_names_partial(batch: pa.Table) -> pa.Table:
    """Extracted rows -> DISTINCT (kind, name) partial (noise applied).

    Filtered to the PDF engines exactly like the oracle's
    ``engine IN ('pdf-text', 'pdf-ocr')`` — today other engines always
    carry empty name lists, but equivalence must not depend on that
    staying true for future extractors."""
    import pyarrow.compute as pc

    batch = batch.filter(pc.is_in(batch["engine"], pa.array(["pdf-text", "pdf-ocr"])))
    seen = set()
    for col, kind in _NAME_COLS:
        for names in batch[col].to_pylist():
            for n in names or []:
                if n:
                    seen.add((kind, perturb(n)))
    kinds, names = zip(*sorted(seen)) if seen else ((), ())
    return pa.table(
        {
            "kind": pa.array(list(kinds), pa.string()),
            "name": pa.array(list(names), pa.string()),
        }
    )


def master_buckets() -> Dict[Tuple[str, int], List[str]]:
    """Master pool keyed by (kind, char length), sorted for tie-breaks."""
    from ..sources.synth import master_lookup_table

    master = master_lookup_table()
    buckets: Dict[Tuple[str, int], List[str]] = {}
    for n, k in zip(master["name"].to_pylist(), master["kind"].to_pylist()):
        kind = "referee" if k == "referee" else "goalie"
        buckets.setdefault((kind, len(n)), []).append(n)
    for v in buckets.values():
        v.sort()
    return buckets


def _codes(names: List[str], width: int) -> np.ndarray:
    a = np.zeros((len(names), width), dtype=np.int64)
    for i, n in enumerate(names):
        a[i, : len(n)] = [ord(c) for c in n]
    return a


def fuzzy_match_batch(batch: pa.Table, buckets_ref) -> pa.Table:
    """Distinct (kind, name) rows -> best hamming-1 master match."""
    import ray as _ray

    buckets = _ray.get(buckets_ref)
    kinds = batch["kind"].to_pylist()
    names = batch["name"].to_pylist()
    best_match: List[str] = []
    dist: List[int] = []
    for kind, name in zip(kinds, names):
        pool = buckets.get((kind, len(name)), ())
        if pool:
            q = np.array([ord(c) for c in name], dtype=np.int64)
            d = (_codes(list(pool), len(name)) != q[None, :]).sum(axis=1)
            j = int(np.argmin(d))  # pool sorted -> argmin is the tie-break
            if d[j] <= 1:
                best_match.append(pool[j])
                dist.append(int(d[j]))
                continue
        best_match.append("")
        dist.append(-1)
    return pa.table(
        {
            "kind": batch["kind"],
            "name": batch["name"],
            "best_match": pa.array(best_match, pa.string()),
            "dist": pa.array(dist, pa.int64()),
        }
    )


def q_master_fuzzy_match(sf_dir: str) -> "object":
    """(kind, name, best_match, dist) — dist in {0, 1}, -1 = no match."""
    import ray
    from ray.data.aggregate import Count

    from .queries_extract import _extracted

    buckets_ref = ray.put(master_buckets())
    distinct = (
        _extracted(sf_dir)
        .map_batches(
            remote_fn(_QF, "explode_names_partial"),
            batch_format="pyarrow",
        )
        .groupby(["kind", "name"])
        .aggregate(Count(alias_name="_n"))
        .drop_columns(["_n"])
    )
    return distinct.map_batches(
        remote_fn(_QF, "fuzzy_match_batch", buckets_ref=buckets_ref),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def fuzzy_oracle_sql(extracted_path: str, master_path: str) -> str:
    legs = "\n  UNION ALL\n".join(
        f"  SELECT '{kind}' AS kind, {col} AS s\n"
        f"  FROM read_parquet('{extracted_path}')\n"
        f"  WHERE engine IN ('pdf-text', 'pdf-ocr') AND {col} <> ''"
        for col, kind in _NAME_COLS
    )
    return f"""
WITH ex0 AS (
{legs}),
ex AS (SELECT kind, unnest(string_split(s, '|')) AS name FROM ex0),
names AS (
  SELECT DISTINCT kind, regexp_replace(name, 'е', 'ё') AS name
  FROM ex WHERE name <> ''),
m AS (
  SELECT CASE WHEN kind = 'referee' THEN 'referee' ELSE 'goalie' END AS kind,
         name AS mname
  FROM read_parquet('{master_path}')),
pos AS (
  SELECT n.kind, n.name, m.mname,
         unnest(generate_series(1, length(n.name))) AS i
  FROM names n JOIN m ON m.kind = n.kind AND length(m.mname) = length(n.name)),
dists AS (
  SELECT kind, name, mname,
         sum(CASE WHEN substr(name, i, 1) <> substr(mname, i, 1)
                  THEN 1 ELSE 0 END) AS dist
  FROM pos GROUP BY kind, name, mname),
best AS (
  SELECT kind, name, mname, dist,
         row_number() OVER (PARTITION BY kind, name
                            ORDER BY dist, mname) AS rn
  FROM dists WHERE dist <= 1)
SELECT n.kind, n.name,
       coalesce(b.mname, '') AS best_match,
       CAST(coalesce(b.dist, -1) AS BIGINT) AS dist
FROM names n
LEFT JOIN best b ON b.kind = n.kind AND b.name = n.name AND b.rn = 1
"""


FUZZY_QUERIES = {"master_fuzzy_match": q_master_fuzzy_match}
