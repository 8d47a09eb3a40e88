"""Mode dispatch (M11) + exploded words surface (M2) tests."""

import pytest


@pytest.fixture(scope="module")
def pages_dir(ray_session, sf_smoke_dir):
    from khl_pdf_ocr_ray.pipelines.extract_pipeline import synthesize_pages

    return synthesize_pages(sf_smoke_dir, repeat=2)


def test_refs_mode_matches_all_mode_ref_columns(ray_session, pages_dir):
    from khl_pdf_ocr_ray.pipelines.extract_pipeline import ExtractConfig, run_extract

    all_df = run_extract(pages_dir).to_pandas().set_index("url")
    refs_df = run_extract(pages_dir, ExtractConfig(mode="refs")).to_pandas().set_index("url")
    assert set(all_df.index) == set(refs_df.index)
    gs = all_df[all_df["engine"].isin(["pdf-text", "pdf-ocr"])]
    for url in gs.index:
        assert list(refs_df.loc[url, "ref_main"]) == list(all_df.loc[url, "ref_main"]), url
        assert list(refs_df.loc[url, "ref_linesmen"]) == list(all_df.loc[url, "ref_linesmen"])
        # unselected extractors stay empty in refs mode
        assert list(refs_df.loc[url, "gk_home_names"]) == []
        assert refs_df.loc[url, "match_date"] == ""


def test_words_mode_no_entities(ray_session, pages_dir):
    from khl_pdf_ocr_ray.pipelines.extract_pipeline import ExtractConfig, run_extract

    words_df = run_extract(pages_dir, ExtractConfig(mode="words")).to_pandas()
    gs = words_df[words_df["engine"].isin(["pdf-text", "pdf-ocr"])]
    assert (gs["ref_main"].map(len) == 0).all()
    # match meta runs in words mode (reference extract_words, app.py:182-186)
    assert (gs[gs["engine"] == "pdf-text"]["match_date"] != "").any()
    # full text still extracted
    assert (gs["text"].str.len() > 0).all()


def test_pdf_words_tokens_roundtrip(ray_session, sf_smoke_dir, pages_dir):
    from khl_pdf_ocr_ray.pipelines.queries import QUERIES
    from khl_pdf_ocr_ray.pipelines.extract_pipeline import ExtractConfig, run_extract

    words = QUERIES["pdf_words"](sf_smoke_dir).to_pandas()
    assert set(words.columns) == {"url", "page", "y_x10", "x_x10", "token"}
    assert len(words) > 0
    # token multiset per url matches the reconstructed text of that url
    text_df = run_extract(pages_dir, ExtractConfig(mode="words")).to_pandas()
    texts = dict(zip(text_df["url"], text_df["text"]))
    sample_urls = words["url"].unique()[:5]
    for url in sample_urls:
        toks = sorted(words[words["url"] == url]["token"])
        # scanned docs have empty text layer -> no word rows for them at all
        text_toks = sorted(t for t in texts[url].split() if t)
        assert toks == text_toks, url


def test_extract_blocks_surface(ray_session, sf_smoke_dir):
    from khl_pdf_ocr_ray.pipelines.queries import QUERIES

    blocks = QUERIES["extract_blocks"](sf_smoke_dir).to_pandas()
    assert len(blocks) > 0
    assert blocks["kept"].any() and (~blocks["kept"]).any()
    # dropped blocks are short or link-heavy; kept ones are neither
    kept = blocks[blocks["kept"]]
    assert (kept["text_len"] >= 25).all()
    assert (kept["link_density_x1e6"] <= 330_000).all()
