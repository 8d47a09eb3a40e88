"""Ingest-source parity tests: URL builder, fetcher actor, master CSV."""

import pyarrow as pa
import pytest

from khl_pdf_ocr_ray.sources.fetch import (
    FetcherStage,
    add_url_column,
    make_pdf_url,
    read_master_csv,
)


def test_make_pdf_url_default_and_proxy():
    # reference template (app.py:49-58)
    assert (
        make_pdf_url("1369", "897689")
        == "https://www.khl.ru/pdf/1369/897689/game-897689-start-ru.pdf"
    )
    assert (
        make_pdf_url("1369", "897689", "https://proxy.example/khlpdf/")
        == "https://proxy.example/khlpdf/1369/897689/game-897689-start-ru.pdf"
    )


def test_add_url_column_vectorized():
    batch = pa.table({"season": ["1", "2"], "uid": ["10", "20"]})
    out = add_url_column(batch)
    assert out["url"][0].as_py().endswith("/1/10/game-10-start-ru.pdf")


def test_fetcher_with_injected_transport():
    calls = []

    def fake(url):
        calls.append(url)
        if "bad" in url:
            raise IOError("boom")
        return b"payload:" + url.encode()

    stage = FetcherStage(transport=fake)
    batch = pa.table({"url": ["https://a/x", "https://a/bad"]})
    out = stage(batch)
    assert out["html"][0].as_py() == b"payload:https://a/x"
    assert out["html"][1].as_py() is None
    assert "boom" in out["fetch_error"][1].as_py()
    assert len(calls) == 2


def test_fetcher_default_transport_is_network_stub():
    stage = FetcherStage()
    batch = pa.table({"url": ["https://a/x"]})
    out = stage(batch)
    assert out["html"][0].as_py() is None
    assert "network access is disabled" in out["fetch_error"][0].as_py()


def test_read_master_csv_bom(tmp_path):
    p = tmp_path / "masters.csv"
    p.write_bytes("﻿Иванов Иван\nПетров Пётр\n\n".encode("utf-8"))
    t = read_master_csv(str(p), "referee")
    assert t["name"].to_pylist() == ["Иванов Иван", "Петров Пётр"]
    assert t["kind"].to_pylist() == ["referee", "referee"]
