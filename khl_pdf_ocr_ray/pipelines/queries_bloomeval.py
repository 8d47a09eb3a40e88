"""Measured Bloom-filter false-positive rate (accuracy-evidence row).

``bloom_fpr_eval``: build the PRODUCTION Bloom bitmap
(functions/bloom.py — splitmix64 mixing, the kernel behind
customers_semi_bloom and bloom_line_dedup) over the distinct event
users, then probe it with a planted stream of guaranteed NON-members
(ids offset past the key domain, asserted) and report the exactly
measured false-positive count and rate. Complements the certified
correctness rows the Bloom path already has with the ACCURACY number a
capacity plan reads (fingerprint_pr_eval / sample_error_eval family):
at these parameters (m=2^20, k=4, n~1.5k) the measured FPR should sit
near the analytic (1 - e^{-kn/m})^k.

Plan / 100 TB notes: the build is the production streaming fold —
per-batch partial bitmaps OR-merged in O(m_bits) driver memory,
duplicate keys idempotent so the raw key stream needs NO distinct
exchange; the bitmap broadcasts once via ray.put; probes fan out as a
range Dataset and fold to per-batch hit counts (ONE scalar Sum). The
only distinct-cardinality exchange is the n_members COUNT, which is
reporting, not filtering.

Oracle: fully INDEPENDENT static SQL — splitmix64 re-derived in DuckDB
HUGEINT (32-bit-split multiply mod 2^64; xor + floor-division shifts —
the shard_resize_moves wraparound convention, parity proven
bit-for-bit), member bit set via DISTINCT positions, probe is a false
positive iff ALL its distinct bit positions are member bits.

Reference analogue: none in /root/reference/app.py; brief scope
(sketch accuracy evidence).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.bloom import DEFAULT_K, DEFAULT_M_BITS, _bit_positions
from ..remote import remote_fn

_QB = "khl_pdf_ocr_ray.pipelines.queries_bloomeval"

PROBE_N = 65_536
PROBE_BASE = 1_000_000_000  # events user_id < 1e9 (asserted at build)


def member_guard_batch(batch: pa.Table) -> pa.Table:
    """Pass-through guard: the probe offset must clear the key domain."""
    import pyarrow.compute as pc

    hi = pc.max(batch["user_id"]).as_py()
    assert hi is None or hi < PROBE_BASE, "probe ids would collide with members"
    return batch


def probe_count_batch(batch: pa.Table, bloom_ref, m_bits: int, k: int) -> pa.Table:
    """Probe-id batch -> one (n_probes, n_fp) partial row."""
    if isinstance(bloom_ref, np.ndarray):  # unit tests pass the array
        bloom = bloom_ref
    else:
        import ray as _ray

        bloom = _ray.get(bloom_ref)
    ids = batch["id"].to_numpy(zero_copy_only=False).astype(np.int64) + PROBE_BASE
    pos = _bit_positions(ids, m_bits, k)
    bits = (bloom[pos // 64] >> (pos % 64).astype(np.uint64)) & np.uint64(1)
    hits = int(bits.all(axis=1).sum())
    return pa.table(
        {
            "n_probes": pa.array([len(ids)], pa.int64()),
            "n_fp": pa.array([hits], pa.int64()),
        }
    )


def q_bloom_fpr_eval(sf_dir: str) -> "object":
    """(m_bits, k, n_members, n_probes, n_fp, fpr_micro) — one row."""
    import pandas as pd
    import ray
    import ray.data as rd
    from ray.data.aggregate import Sum

    from ..functions.bloom import build_bloom
    from .queries import _t

    users = _t(sf_dir, "events", ["user_id"]).map_batches(
        remote_fn(_QB, "member_guard_batch"),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    bitmap = build_bloom(users, "user_id")  # dup keys idempotent: no distinct
    n_members = users.unique("user_id")
    bloom_ref = ray.put(bitmap)
    counts = (
        rd.range(PROBE_N)
        .map_batches(
            remote_fn(
                _QB,
                "probe_count_batch",
                bloom_ref=bloom_ref,
                m_bits=DEFAULT_M_BITS,
                k=DEFAULT_K,
            ),
            batch_format="pyarrow",
        )
        .aggregate(Sum("n_probes", alias_name="p"), Sum("n_fp", alias_name="fp"))
    )
    n_probes, n_fp = int(counts["p"]), int(counts["fp"])
    return pd.DataFrame(
        {
            "m_bits": pd.Series([DEFAULT_M_BITS], dtype="int64"),
            "k": pd.Series([DEFAULT_K], dtype="int64"),
            "n_members": pd.Series([len(n_members)], dtype="int64"),
            "n_probes": pd.Series([n_probes], dtype="int64"),
            "n_fp": pd.Series([n_fp], dtype="int64"),
            "fpr_micro": pd.Series([1_000_000 * n_fp // n_probes], dtype="int64"),
        }
    )


def _splitmix_sql(x_expr: str, salt_expr: str) -> str:
    """splitmix64 of ``x_expr`` (HUGEINT, < 2^64) in DuckDB — bit-for-bit
    vs functions/bloom._mix64 (32-bit-split multiply mod 2^64)."""
    M64 = 1 << 64
    C1, C2, C3 = 0x9E3779B97F4A7C15, 0xBF58476D1CE4E5B9, 0x94D049BB133111EB

    def mulmod(a: str, b: int) -> str:
        bl, bh = b & 0xFFFFFFFF, b >> 32
        return (
            f"((({a}) * {bl} + (((({a}) * {bh}) % 4294967296)"
            f" * 4294967296)) % {M64})"
        )

    def xshift(a: str, s: int) -> str:
        return f"xor(({a}), ({a}) // {1 << s})"

    z0 = f"((CAST({x_expr} AS HUGEINT) + ({salt_expr}) + {C1}) % {M64})"
    z1 = mulmod(xshift(z0, 30), C2)
    z2 = mulmod(xshift(z1, 27), C3)
    return xshift(z2, 31)


def _sql() -> str:
    h = _splitmix_sql("u", "salt")
    return f"""
WITH salts AS (SELECT unnest([{", ".join(str(i + 1) for i in range(DEFAULT_K))}]) AS salt),
members AS (SELECT DISTINCT user_id AS u FROM events),
mb AS (
  SELECT DISTINCT CAST(({h}) % {DEFAULT_M_BITS} AS BIGINT) AS b
  FROM members, salts),
probes AS (SELECT {PROBE_BASE} + CAST(j AS BIGINT) AS u
           FROM range({PROBE_N}) t(j)),
pb AS (
  SELECT u, CAST(({h}) % {DEFAULT_M_BITS} AS BIGINT) AS b
  FROM probes, salts),
pd AS (SELECT DISTINCT u, b FROM pb),
fp AS (
  SELECT pd.u
  FROM pd LEFT JOIN mb ON mb.b = pd.b
  GROUP BY pd.u
  HAVING count(*) = count(mb.b))
SELECT CAST({DEFAULT_M_BITS} AS BIGINT) AS m_bits,
       CAST({DEFAULT_K} AS BIGINT) AS k,
       (SELECT CAST(count(*) AS BIGINT) FROM members) AS n_members,
       CAST({PROBE_N} AS BIGINT) AS n_probes,
       (SELECT CAST(count(*) AS BIGINT) FROM fp) AS n_fp,
       (SELECT CAST(1000000 * count(*) // {PROBE_N} AS BIGINT) FROM fp)
         AS fpr_micro
"""


BLOOMEVAL_QUERIES = {"bloom_fpr_eval": q_bloom_fpr_eval}
BLOOMEVAL_ORACLES = {"bloom_fpr_eval": _sql()}
