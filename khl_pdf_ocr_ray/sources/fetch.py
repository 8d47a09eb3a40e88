"""Ingest-side sources: URL building, HTTP fetch actor, master-CSV reader.

Parity with the reference's ingest surface (SURVEY.md §2.1):
- S1 ``make_pdf_url`` — the reference's URL template incl. the optional
  proxy base (/root/reference/app.py:49-58).
- S2/D1 ``FetcherStage`` — the connection-pool-per-worker fetch stage: a
  session is built once per actor (the reference holds one module-global
  ``requests.Session``, app.py:32-39, under 2 gunicorn workers; here it is
  one session per pool actor). This sandbox has NO network, so the default
  transport raises a marked error; tests inject a fake transport. In the
  engine's normal operation payload bytes arrive in the ``html`` column of
  the input parquet and this stage is not used.
- S5 ``read_master_csv`` — the reference's master-list format: one
  "Фамилия Имя" per line, UTF-8 with BOM, no header
  (referees_master.csv / players_master.csv).
"""

from __future__ import annotations

from typing import Callable, Dict, List, Optional

import pyarrow as pa

DEFAULT_PDF_BASE = "https://www.khl.ru/pdf"


def make_pdf_url(season: str, uid: str, proxy_base: str = "") -> str:
    """Game-sheet URL template (app.py:49-58): with a proxy base configured
    the path is appended to it, else to the default host."""
    path = f"{season}/{uid}/game-{uid}-start-ru.pdf"
    base = proxy_base.rstrip("/") if proxy_base else DEFAULT_PDF_BASE
    return f"{base}/{path}"


def add_url_column(batch: pa.Table, proxy_base: str = "") -> pa.Table:
    """Vectorized S1 projection: (season, uid) columns -> url column."""
    urls = [
        make_pdf_url(s, u, proxy_base)
        for s, u in zip(batch["season"].to_pylist(), batch["uid"].to_pylist())
    ]
    return batch.append_column("url", pa.array(urls, pa.string()))


class FetcherStage:
    """Actor-pool fetch stage: session built once per actor (D1).

    Use: ``ds.map_batches(FetcherStage, fn_constructor_kwargs={...},
    concurrency=(2, 8), batch_size=16, batch_format="pyarrow")``.
    ``transport`` is a callable ``url -> bytes`` injected for tests; the
    default builds a requests.Session with the reference's headers
    (app.py:33-39) and STUBS the actual GET because this sandbox has no
    network access.
    """

    UA = (
        "Mozilla/5.0 (Windows NT 10.0; Win64; x64) "
        "AppleWebKit/537.36 (KHTML, like Gecko) Chrome/120.0 Safari/537.36"
    )

    def __init__(self, timeout: float = 30.0, transport: Optional[Callable] = None):
        self.timeout = timeout
        if transport is not None:
            self.transport = transport
        else:
            try:
                import requests  # noqa: F401

                session = requests.Session()
                session.headers.update(
                    {
                        "User-Agent": self.UA,
                        "Accept": "application/pdf,*/*;q=0.9",
                        # the reference pins a khl.ru Referer (app.py:38);
                        # the CDN may reject referer-less requests
                        "Referer": "https://www.khl.ru/",
                    }
                )
                self._session = session

                def _get(url: str) -> bytes:
                    raise NotImplementedError(
                        "network access is disabled in this sandbox; inject a "
                        "transport or supply payloads in the input parquet"
                    )

                self.transport = _get
            except Exception:  # pragma: no cover - requests always present
                # no transport at all: fail with the clear message per ROW
                # (in-band error contract), never a cryptic NoneType call
                def _no_transport(url: str) -> bytes:
                    raise NotImplementedError(
                        "no HTTP transport available (requests missing and "
                        "none injected); supply payloads in the input parquet"
                    )

                self.transport = _no_transport

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads: List[Optional[bytes]] = []
        errors: List[str] = []
        for url in batch["url"].to_pylist():
            try:
                payloads.append(self.transport(url))
                errors.append("")
            except Exception as e:  # in-band error rows (app.py:392-396)
                payloads.append(None)
                errors.append(str(e)[:200])
        return batch.append_column(
            "html", pa.array(payloads, pa.binary())
        ).append_column("fetch_error", pa.array(errors, pa.string()))


def read_master_csv(path: str, kind: str) -> pa.Table:
    """Read a reference-format master list (UTF-8-BOM, one name per line,
    no header) into the lookup-table shape (FIXTURES.md F3)."""
    with open(path, encoding="utf-8-sig") as f:
        names = [ln.strip() for ln in f if ln.strip()]
    return pa.table(
        {"name": pa.array(names, pa.string()), "kind": pa.array([kind] * len(names))}
    )
