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
