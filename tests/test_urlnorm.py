"""URL canonicalization kernel (functions/urlnorm.py)."""

from khl_pdf_ocr_ray.functions.urlnorm import normalize_url


def test_case_and_default_port():
    assert (
        normalize_url("HTTPS://Site1.Example.ORG:443/p/1-0")
        == "https://site1.example.org/p/1-0"
    )
    assert (
        normalize_url("http://host.example:80/a") == "http://host.example/a"
    )
    # non-default port survives
    assert normalize_url("https://h.example:8443/a") == "https://h.example:8443/a"


def test_tracking_params_and_fragment_dropped():
    u = "https://h.example/p?utm_source=feed&b=2&fbclid=x&a=1#frag"
    assert normalize_url(u) == "https://h.example/p?a=1&b=2"


def test_param_sorting_is_stable():
    assert normalize_url("https://h.example/p?z=1&a=2") == normalize_url(
        "https://h.example/p?a=2&z=1"
    )


def test_trailing_slash_and_empty_path():
    assert normalize_url("https://h.example/dir/") == "https://h.example/dir"
    assert normalize_url("https://h.example") == "https://h.example/"
    assert normalize_url("https://h.example/") == "https://h.example/"


def test_idempotent_and_safe_on_garbage():
    u = "https://h.example/p?a=1"
    assert normalize_url(normalize_url(u)) == normalize_url(u)
    assert normalize_url("not a url") == "not a url"
    assert normalize_url("") == ""


def test_variant_merges_to_canonical():
    base = "https://site12.example.org/p/438-0"
    variant = "HTTPS://SITE12.EXAMPLE.ORG:443/p/438-0?utm_source=feed&fbclid=abc123#frag"
    assert normalize_url(variant) == normalize_url(base) == base


# --- property tests ----------------------------------------------------------
from hypothesis import given, settings
from hypothesis import strategies as st

_scheme = st.sampled_from(["http", "https", "HTTP", "HTTPS", "Http"])
_host = st.from_regex(r"[A-Za-z0-9]([A-Za-z0-9.-]{0,20}[A-Za-z0-9])?", fullmatch=True)
_path = st.from_regex(r"(/[A-Za-z0-9._~%-]{0,8}){0,4}/?", fullmatch=True)
_key = st.from_regex(r"[A-Za-z0-9_]{1,8}", fullmatch=True)
_val = st.from_regex(r"[A-Za-z0-9_]{0,8}", fullmatch=True)
_query = st.lists(st.tuples(_key, _val), max_size=4).map(
    lambda kvs: "&".join(f"{k}={v}" for k, v in kvs)
)
_frag = st.from_regex(r"[A-Za-z0-9]{0,6}", fullmatch=True)


@st.composite
def _urls(draw):
    u = f"{draw(_scheme)}://{draw(_host)}{draw(_path)}"
    q = draw(_query)
    if q:
        u += f"?{q}"
    f = draw(_frag)
    if f:
        u += f"#{f}"
    return u


@settings(max_examples=200, deadline=None)
@given(_urls())
def test_normalize_idempotent(u):
    once = normalize_url(u)
    assert normalize_url(once) == once


@settings(max_examples=200, deadline=None)
@given(_urls())
def test_normalize_drops_fragment_and_case(u):
    n = normalize_url(u)
    assert "#" not in n
    scheme, _, rest = n.partition("://")
    host = rest.split("/", 1)[0].rsplit(":", 1)[0]
    assert scheme == scheme.lower() and host == host.lower()


def test_invalid_port_passes_through_unchanged():
    # parts.port parses lazily and raises; the guard must cover it
    assert normalize_url("http://h.example:8x/a") == "http://h.example:8x/a"
    assert normalize_url("http://h.example:99999/a") == "http://h.example:99999/a"


def test_userinfo_is_preserved_not_merged():
    assert normalize_url("http://user:pw@H.Example/a") == "http://user:pw@h.example/a"
    assert normalize_url("http://alice@host/x") != normalize_url("http://host/x")


def test_only_directory_style_trailing_slash_strips():
    assert normalize_url("https://h.example/a/b/") == "https://h.example/a/b"
    # empty segments are significant and preserved
    assert normalize_url("https://h.example/a/b//") == "https://h.example/a/b//"
    assert normalize_url("https://h.example/") == "https://h.example/"


def test_url_template_collapses_digits_and_drops_query():
    from khl_pdf_ocr_ray.functions.urlnorm import url_template

    assert (
        url_template("https://KHL.ru/2023/891/game-891-start-ru.pdf?x=1#f")
        == "khl.ru/{n}/{n}/game-{n}-start-ru.pdf"
    )
    # empty path -> "/", host lowercased
    assert url_template("http://Host.COM") == "host.com/"
    # non-parsing input: digits still collapse, never raises
    assert url_template("not a url 123") == "not a url {n}"
    # malformed port: hostname still parses; the port never enters the
    # template (templates key on host + path structure only)
    assert url_template("http://h:bad_port/a1") == "h/a{n}"
