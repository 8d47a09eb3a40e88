"""Job preflight — the engine analogue of the reference's GET /health
(/root/reference/app.py:371-373): validate inputs and engine availability
BEFORE launching a long job, instead of failing partitions at runtime.

Also carries the debug JSON sink (S4's ensure_ascii=False JSON envelope,
app.py:28, 417, generalized to a partitioned sink for debug samples).
"""

from __future__ import annotations

import os
from typing import Dict, List

import pyarrow.parquet as pq

PAGES_REQUIRED = {
    "url": "string",
    "warc_ts": "timestamp[us]",
    "html": "binary",
    "text": "string",
    "lang": "string",
}


def preflight(pages_path: str) -> Dict:
    """Check the input corpus + engine capabilities; returns a status dict
    (``ok`` plus per-check detail). Never raises for check failures."""
    from ..sources.wordbox import HAS_PYMUPDF
    from ..stages.multimodal import HAS_PIL

    checks: Dict[str, object] = {}
    ok = True

    try:
        frags = (
            sorted(
                f
                for f in os.listdir(pages_path)
                if f.endswith(".parquet")
            )
            if os.path.isdir(pages_path)
            else [pages_path]
        )
        checks["n_fragments"] = len(frags)
        first = os.path.join(pages_path, frags[0]) if os.path.isdir(pages_path) else pages_path
        schema = pq.ParquetFile(first).schema_arrow
        missing: List[str] = []
        mistyped: List[str] = []
        for name, typ in PAGES_REQUIRED.items():
            if name not in schema.names:
                missing.append(name)
            elif str(schema.field(name).type) != typ:
                mistyped.append(f"{name}: {schema.field(name).type} != {typ}")
        checks["schema_missing"] = missing
        checks["schema_mistyped"] = mistyped
        if missing or mistyped:
            ok = False
    except Exception as e:
        checks["input_error"] = str(e)
        ok = False

    # engine availability flags (reference: tesseract probe, app.py:17-22)
    checks["pymupdf"] = HAS_PYMUPDF           # real-PDF path
    checks["pil"] = HAS_PIL                   # real-image path
    checks["wbox_engine"] = True              # deterministic stand-in, always on
    return {"ok": ok, "engine": "ready" if ok else "unavailable", **checks}


def write_debug_json(ds, out_dir: str, limit: int = 100) -> str:
    """Debug sample sink: first ``limit`` rows as JSON (non-ASCII preserved,
    the reference's ensure_ascii=False behavior). Parquet is the production
    sink; this is the human-readable side channel."""
    import json

    os.makedirs(out_dir, exist_ok=True)
    rows = ds.take(limit)
    path = os.path.join(out_dir, "sample.json")
    with open(path, "w", encoding="utf-8") as f:
        for row in rows:
            f.write(json.dumps(row, ensure_ascii=False, default=str) + "\n")
    return path
