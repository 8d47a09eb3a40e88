"""Sitemap XML source tests: serialize/parse roundtrip, the planted
truncation, namespace handling, and empty-source edge."""

import pandas as pd
import pyarrow as pa

from khl_pdf_ocr_ray.pipelines.queries_sitemap import (
    SITEMAP_BROKEN,
    sitemap_build_group,
    sitemap_parse_batch,
)


def _parse_one(source: str, doc_ids):
    xml = sitemap_build_group(
        pd.DataFrame({"source": source, "doc_id": list(doc_ids)})
    )["xml"].iloc[0]
    return (
        sitemap_parse_batch(
            pa.table({"source": [source], "xml": [xml]})
        )
        .to_pandas()
        .iloc[0]
    )


def test_roundtrip_counts_and_days():
    row = _parse_one("src3", [0, 27, 28, 100])
    assert row.ok
    assert row.n_urls == 4
    # lastmod day = 1 + doc_id % 28: ids 0,27,28,100 -> 1,28,1,17
    assert row.min_day == 1
    assert row.max_day == 28


def test_broken_source_yields_error_row():
    row = _parse_one(SITEMAP_BROKEN, [1, 2, 3])
    assert not row.ok
    assert (row.n_urls, row.min_day, row.max_day) == (0, -1, -1)


def test_parse_rejects_arbitrary_truncation():
    good = sitemap_build_group(
        pd.DataFrame({"source": "src1", "doc_id": [5, 6]})
    )["xml"].iloc[0]
    for cut in (10, len(good) // 3, len(good) - 5):
        row = (
            sitemap_parse_batch(
                pa.table({"source": ["src1"], "xml": [good[:cut]]})
            )
            .to_pandas()
            .iloc[0]
        )
        assert not row.ok, cut


def test_xml_is_namespaced_and_deterministic():
    a = sitemap_build_group(
        pd.DataFrame({"source": "src2", "doc_id": [9, 4]})
    )["xml"].iloc[0]
    b = sitemap_build_group(
        pd.DataFrame({"source": "src2", "doc_id": [4, 9]})
    )["xml"].iloc[0]
    assert a == b  # order-independent serialization (sorted by doc_id)
    assert "http://www.sitemaps.org/schemas/sitemap/0.9" in a
    assert a.index("/doc/4") < a.index("/doc/9")
