"""HTML main-content extraction tests (north_star component 1)."""

from khl_pdf_ocr_ray.functions.html_extract import extract_main_content

PAGE = b"""<!doctype html>
<html><head><title> My  Title </title><script>var a=1;</script></head>
<body>
<header><h1>Site header junk</h1></header>
<nav><ul><li><a href="/">home page link</a></li><li><a href="/b">another navigation link</a></li></ul></nav>
<article>
<p>This is the first real paragraph of the article body text.</p>
<p>tiny</p>
<p>Second paragraph with more than twenty five characters of content.</p>
<div><a href="/x">link one here</a> <a href="/y">link two goes here too</a></div>
</article>
<aside><p>subscribe to our newsletter for daily updates now</p></aside>
<footer><p>copyright twenty twenty four example press incorporated</p></footer>
</body></html>"""


def test_boilerplate_stripped_and_spans_align():
    out = extract_main_content(PAGE)
    assert out["title"] == "My Title"
    assert out["text"] == (
        "This is the first real paragraph of the article body text.\n"
        "Second paragraph with more than twenty five characters of content."
    )
    # spans index exactly into text
    for sp in out["spans"]:
        seg = out["text"][sp["start"] : sp["end"]]
        assert seg and "\n" not in seg
    assert [sp["kind"] for sp in out["spans"]] == ["p", "p"]


def test_link_density_filter():
    html = b"<div><p>" + b"x" * 30 + b'</p><p><a href="/">' + b"y" * 30 + b"</a></p></div>"
    out = extract_main_content(html)
    assert out["text"] == "x" * 30  # all-link paragraph dropped


def test_min_text_len_filter():
    out = extract_main_content(b"<p>short one</p><p>%s</p>" % (b"long enough paragraph here ok yes",))
    assert out["text"] == "long enough paragraph here ok yes"


def test_malformed_html_no_crash():
    out = extract_main_content(b"<div><p>unclosed paragraph that is certainly long enough to keep")
    assert "unclosed paragraph" in out["text"]


def test_nested_blocks_no_double_count():
    html = (
        b"<div><p>inner paragraph text that is long enough to keep around</p></div>"
    )
    out = extract_main_content(html)
    assert out["text"] == "inner paragraph text that is long enough to keep around"
    assert len(out["spans"]) == 1


def test_bytes_and_str_equivalent():
    s = "<p>paragraph with unicode текст длиной достаточной</p>"
    assert extract_main_content(s)["text"] == extract_main_content(s.encode())["text"]


def test_deterministic():
    assert extract_main_content(PAGE) == extract_main_content(PAGE)


def test_nested_anchor_inside_paragraph_counts_links_only():
    html = (
        b"<p>Some leading text that is long enough to keep around "
        b'<a href="/x">short link</a> trailing text here</p>'
    )
    out = extract_main_content(html)
    assert "short link" in out["text"]  # low link density -> kept whole


def test_table_cells_are_blocks():
    html = (
        b"<table><tr><td>first cell with plenty of text content here</td>"
        b"<td>second cell also has plenty of text content here</td></tr></table>"
    )
    out = extract_main_content(html)
    assert "first cell" in out["text"] and "second cell" in out["text"]
    assert [s["kind"] for s in out["spans"]] == ["td", "td"]


def test_no_body_blocks_yields_empty():
    out = extract_main_content(b"<html><head><title>t</title></head><body>stray bare text</body></html>")
    assert out["text"] == ""  # bare text outside any block element
    assert out["title"] == "t"


def test_unclosed_nav_swallows_rest_deterministically():
    html = b"<nav><ul><li>menu</li></ul><p>trapped paragraph that is long enough text</p>"
    out = extract_main_content(html)
    assert out["text"] == ""  # unclosed chrome subtree drops the rest; stable


def test_empty_and_whitespace_inputs():
    assert extract_main_content(b"")["text"] == ""
    assert extract_main_content(b"   \n\t  ")["text"] == ""


def test_void_tag_inside_chrome_does_not_leak_boilerplate():
    # regression: handle_startendtag fires start+end for <img/>; the end
    # event must not decrement the chrome skip depth
    html = (
        b'<nav><img src="logo.png" /><p>subscribe to our newsletter and win prizes</p></nav>'
        b"<article><p>real content paragraph long enough to keep</p></article>"
    )
    out = extract_main_content(html)
    assert out["text"] == "real content paragraph long enough to keep"
    assert "newsletter" not in out["text"]


def test_self_closing_br_hr_inside_footer_no_leak():
    html = (
        b"<footer><hr/><br/><p>copyright footer junk that is long enough text</p></footer>"
        b"<p>kept paragraph with enough characters to pass the filter</p>"
    )
    out = extract_main_content(html)
    assert out["text"] == "kept paragraph with enough characters to pass the filter"


def test_fast_tokenizer_matches_html_parser_oracle(sf_smoke_dir, ray_session):
    """The regex tokenizer must reproduce the html.parser-based collector
    exactly (blocks, densities, title) over the synthesized corpus."""
    import glob

    import pyarrow.parquet as pq

    from khl_pdf_ocr_ray.functions.html_extract import (
        extract_blocks,
        extract_blocks_reference,
    )
    from khl_pdf_ocr_ray.pipelines.extract_pipeline import synthesize_pages
    from khl_pdf_ocr_ray.sources.wordbox import sniff_content_type

    pages_dir = synthesize_pages(sf_smoke_dir, repeat=2)
    n = 0
    for f in sorted(glob.glob(pages_dir + "/*.parquet")):
        t = pq.read_table(f, columns=["url", "html"])
        for payload in t["html"].to_pylist():
            if sniff_content_type(payload) != "text/html":
                continue
            html = payload.decode("utf-8", errors="replace")
            fb, ft = extract_blocks(html)
            rb, rt = extract_blocks_reference(html)
            assert ft == rt
            assert len(fb) == len(rb)
            for a, b in zip(fb, rb):
                assert (a.kind, a.text, a.link_chars, a.total_chars, a.inner_tags) == (
                    b.kind, b.text, b.link_chars, b.total_chars, b.inner_tags
                )
            n += 1
    assert n > 100


def test_fast_tokenizer_edge_cases_match_oracle():
    """Hand-picked tricky inputs: rawtext, comments, self-closing, entities,
    misnesting, bare angle brackets inside well-formed tags."""
    from khl_pdf_ocr_ray.functions.html_extract import (
        extract_blocks,
        extract_blocks_reference,
    )

    cases = [
        "<p>a &amp; b &lt;tag&gt; &#65;</p>",
        "<script>if (a<b && c>d) { x('</div>'); }</script><p>after script body here</p>",
        "<style>p>a{color:red}</style><p>styled paragraph content text</p>",
        "<!-- <p>commented out</p> --><p>real paragraph text here</p>",
        "<div/><p>self closing div above</p>",
        "<p>outer <div>inner misnested</p> tail</div>",
        "<title>t1</title><title>t2</title><p>two titles</p>",
        "<nav><script>var x=1;</script><p>menu</p></nav><p>content paragraph here</p>",
        "<p>unclosed paragraph at end of document",
        "<P>UPPER CASE TAGS</P><DIV>more</DIV>",
        "<p da-ta='x>y'>attr with gt</p>",
        "<img src='x'/><p>void self closing</p>",
        "<?xml version='1.0'?><p>after pi</p>",
        "<![CDATA[ <p>not a block</p> ]]><p>after cdata</p>",
    ]
    for html in cases:
        fb, ft = extract_blocks(html)
        rb, rt = extract_blocks_reference(html)
        assert ft == rt, html
        assert [
            (a.kind, a.text, a.link_chars, a.total_chars, a.inner_tags) for a in fb
        ] == [
            (b.kind, b.text, b.link_chars, b.total_chars, b.inner_tags) for b in rb
        ], html


# --- C4-style line dedup (functions/lines.py + q_line_dedup) -----------------
def test_kept_line_rows_kernel():
    from khl_pdf_ocr_ray.functions.lines import kept_line_rows, pos_key

    html = (
        b"<html><body><h2>Title words here for density</h2>"
        b"<p>first real paragraph with plenty of words to keep</p>"
        b"<p>   </p>"  # kept-but-empty after collapse -> no line row
        b"<p>first  real \n paragraph with plenty of words to keep</p>"
        b"</body></html>"
    )
    rows = kept_line_rows(html)
    # non-HTML payloads produce no line rows
    assert kept_line_rows(b"%WBOX nope") == []
    assert all(n > 0 for _, _, n in rows)
    # whitespace-collapsed identity: the two paragraphs share one md5
    md5s = [h for _, h, _ in rows]
    assert len(md5s) >= 2 and len(set(md5s)) < len(md5s)
    assert pos_key("http://a/x", 3) == "http://a/x|000003"


def test_line_dedup_invariants(ray_session, sf_smoke_dir):
    """Corpus-wide: kept lines == distinct line hashes; every url's removal
    count is bounded by its line count."""
    import duckdb

    from khl_pdf_ocr_ray.pipelines.queries import QUERIES, oracles

    df = QUERIES["line_dedup"](sf_smoke_dir).to_pandas()
    assert (df["n_removed"] <= df["n_lines"]).all()
    assert (df["chars_kept"] >= 0).all()
    sqls = oracles(sf_smoke_dir)
    # distinct-hash count from the sequential dump the oracle reads
    path = sqls["line_dedup"].split("read_parquet('")[1].split("'")[0]
    n_distinct = duckdb.sql(
        f"SELECT count(DISTINCT line_md5) FROM read_parquet('{path}')"
    ).fetchone()[0]
    assert int((df["n_lines"] - df["n_removed"]).sum()) == int(n_distinct)


# --- host-graph PageRank (functions/graph.py + q_host_pagerank) ---------------
def test_pagerank_sequential_hand_graph():
    """A -> B single edge: after one round B = teleport + damp(A)/1 and A
    falls to pure teleport; ranks stay >= teleport forever."""
    from khl_pdf_ocr_ray.functions.graph import (
        PR_SCALE,
        PR_TELEPORT,
        pagerank_sequential,
        pr_contrib,
    )

    r = pagerank_sequential({("a", "b"): 1}, {"a", "b"}, iters=1)
    assert r["a"] == PR_TELEPORT
    assert r["b"] == PR_TELEPORT + pr_contrib(PR_SCALE, 1, 1)
    r3 = pagerank_sequential({("a", "b"): 1}, {"a", "b"}, iters=3)
    assert min(r3.values()) >= PR_TELEPORT


def test_host_pagerank_invariants(ray_session, sf_smoke_dir):
    """Corpus: the hot host receives no planted links (all dsts are
    siteN.example.org), so its rank is exactly the teleport floor; total
    mass never exceeds the initial nodes x SCALE (dangling mass leaks,
    never grows)."""
    from khl_pdf_ocr_ray.functions.graph import PR_SCALE, PR_TELEPORT
    from khl_pdf_ocr_ray.pipelines.queries import QUERIES

    df = QUERIES["host_pagerank"](sf_smoke_dir).to_pandas()
    assert (df["pagerank_fx"] >= PR_TELEPORT).all()
    hot = df[df["host"] == "hot.example.com"]
    assert len(hot) == 1 and int(hot["pagerank_fx"].iloc[0]) == PR_TELEPORT
    assert int(df["pagerank_fx"].sum()) <= len(df) * PR_SCALE


def test_pagerank_join_path_matches_broadcast_path(ray_session, sf_smoke_dir, monkeypatch):
    """Force the large-|hosts| keyed-join branch (the 100 TB path) and
    check bit-identical ranks (integer fixed-point, order-independent)."""
    import khl_pdf_ocr_ray.pipelines.queries_extract as qe

    broadcast = qe.q_host_pagerank(sf_smoke_dir).to_pandas()
    monkeypatch.setattr(qe, "PR_BROADCAST_MAX", 0)
    joined = qe.q_host_pagerank(sf_smoke_dir).to_pandas()
    a = broadcast.sort_values("host").reset_index(drop=True)
    b = joined.sort_values("host").reset_index(drop=True)
    assert a.equals(b)
