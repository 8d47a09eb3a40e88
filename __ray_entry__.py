"""Driver contract for the graft builder (Ray Data target).

The driver calls ``ray.init(...)`` itself before importing this module:
nothing here (or in the library) initialises or shuts down Ray.

- ``entry()``    — flagship extraction pipeline over a deterministic
  Common-Crawl-style pages corpus synthesized from
  /root/testdata/sf0.001/documents.parquet (BASELINE.json input_hint
  schema: url, warc_ts, html:binary, text, lang).
- ``queries()``  — one callable per implemented operator (SURVEY.md §2).
- ``oracle_sql()`` — DuckDB-equivalent SQL for the SQL-expressible subset
  (same column names as the Ray results).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable
from typing import Any

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_SMOKE = "/root/testdata/sf0.001"


def entry() -> Any:
    """Flagship: synthesize pages (cached) -> streaming extract pipeline."""
    from khl_pdf_ocr_ray.pipelines.extract_pipeline import (
        run_extract,
        synthesize_pages,
    )

    pages_dir = synthesize_pages(SF_SMOKE, repeat=2)
    return run_extract(pages_dir)


def queries() -> dict[str, Callable[[str], Any]]:
    from khl_pdf_ocr_ray.pipelines.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """Static oracles over the driver's views, plus dump-backed oracles for
    the extraction/media/fingerprint surfaces: a SEQUENTIAL (non-Ray)
    reimplementation processes the sf0.01 pages corpus once into parquet
    dumps under /tmp/khlray_cache, and the SQL reads those dumps — so the
    driver's gate covers the distributed pipeline end-to-end."""
    from khl_pdf_ocr_ray.pipelines.queries import oracles

    return oracles()
