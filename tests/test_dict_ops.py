"""Kernel tests for multi-pattern dictionary tagging."""

import pyarrow as pa

from khl_pdf_ocr_ray.pipelines.queries_dict import (
    DICT_PATTERNS,
    dict_tag_partial,
)


def _out(texts):
    batch = pa.table({"text": pa.array(texts, pa.string())})
    df = dict_tag_partial(batch).to_pandas().set_index("pattern")
    return df


def test_counts_docs_and_occurrences():
    df = _out(["data row data", "no hits here", None])
    assert df.loc["data", "n_docs"] == 1
    assert df.loc["data", "n_occ"] == 2
    assert df.loc["data row", "n_occ"] == 1
    assert df.loc["zz-absent-zz", "n_occ"] == 0
    assert df.loc["zz-absent-zz", "n_docs"] == 0


def test_non_overlapping_semantics():
    # 'a r' occurs non-overlapping; cross-word-boundary substring
    df = _out(["a ra r", "a r"])
    assert df.loc["a r", "n_occ"] == 3  # 2 in the first (left-to-right) + 1
    assert df.loc["a r", "n_docs"] == 2


def test_every_pattern_always_present():
    df = _out([""])
    assert sorted(df.index) == sorted(DICT_PATTERNS)
    assert (df["n_occ"] == 0).all()
