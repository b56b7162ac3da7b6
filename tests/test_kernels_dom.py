"""Unit tests for the DOM block parser (detect-scan analog)."""

from gluon_ocr_spark.kernels.blocks import block_evidence, block_probability, detect_regions
from gluon_ocr_spark.kernels.dom import parse_blocks
from gluon_ocr_spark.kernels.extract import extract_document


def test_basic_blocks_and_order():
    html = b"<html><body><p>alpha one</p><p>beta two</p><div>gamma</div></body></html>"
    blocks = parse_blocks(html)
    assert [b.text for b in blocks] == ["alpha one", "beta two", "gamma"]
    assert [b.order for b in blocks] == [0, 1, 2]
    assert [b.tag for b in blocks] == ["p", "p", "div"]


def test_whitespace_collapse_and_entities():
    html = b"<p>  a\n\t b  &amp; c &lt;d&gt; </p>"
    (b,) = parse_blocks(html)
    assert b.text == "a b & c <d>"


def test_inline_tags_do_not_split():
    html = b"<p>one <b>two</b> <span>three</span> four</p>"
    (b,) = parse_blocks(html)
    assert b.text == "one two three four"


def test_br_becomes_space():
    html = b"<p>one<br>two</p>"
    (b,) = parse_blocks(html)
    assert b.text == "one two"


def test_script_style_head_skipped():
    html = b"<head><title>T</title><style>p{}</style></head><body><script>var x='<p>no</p>';</script><p>yes</p></body>"
    blocks = parse_blocks(html)
    assert [b.text for b in blocks] == ["yes"]


def test_link_chars_counted():
    html = b'<p>abc <a href="/x">defgh</a> ij</p>'
    (b,) = parse_blocks(html)
    assert b.text == "abc defgh ij"
    assert b.link_chars == 5
    assert 0.3 < b.link_density < 0.6


def test_nearest_evidence_wins():
    html = b'<main><section class="comments"><h3>Comments</h3></section><p>body text here</p></main>'
    blocks = parse_blocks(html)
    h3 = next(b for b in blocks if b.tag == "h3")
    p = next(b for b in blocks if b.tag == "p")
    assert block_evidence(h3) == "boiler"
    assert block_evidence(p) == "content"


def test_malformed_html_total():
    # unclosed tags, stray close tags, garbage bytes — never raises
    for payload in [b"", b"<p>a", b"</div>junk<b>x", b"\xff\xfe\x00garbage", b"<p " + b"x" * 100]:
        r = extract_document(payload)
        assert isinstance(r.text, str)


def test_nav_dropped_plain_divs_kept():
    html = (
        b'<body><nav><ul><li><a href="/">Home</a></li><li><a href="/a">About</a></li></ul></nav>'
        b"<div>this is a long enough plain paragraph of real page content words</div></body>"
    )
    r = extract_document(html)
    assert r.text == "this is a long enough plain paragraph of real page content words"


def test_probability_bounds():
    for b in parse_blocks(b"<nav><li><a href='/'>Home</a></li></nav><article><p>some body content text</p></article>"):
        assert 0.0 <= block_probability(b) <= 1.0


def test_regions_reading_order():
    html = (
        b"<article><p>first paragraph with plenty of content words inside it</p>"
        b'<div class="ad"><a href="/b">buy now cheap deal</a></div>'
        b"<p>second paragraph also with plenty of content words inside</p></article>"
    )
    regions = detect_regions(parse_blocks(html))
    texts = [b.text for r in regions for b in r.blocks]
    assert texts == [
        "first paragraph with plenty of content words inside it",
        "second paragraph also with plenty of content words inside",
    ]


def test_spans_offsets_consistent():
    html = b"<article><h1>Title Here</h1><p>para one content words enough</p><p>para two content words enough</p></article>"
    r = extract_document(html)
    assert r.text == "\n".join(ln.text for ln in r.lines)
    for ln in r.lines:
        assert r.text[ln.start : ln.end] == ln.text


def test_truncated_tag_many_quotes_is_linear():
    """A truncated crawl tag with many quote chars must parse in
    linear time — the old _TAIL_RE alternation backtracked
    exponentially (~8x per 4 extra quotes) and hung the executor."""
    import time

    from gluon_ocr_spark.kernels.dom import parse_blocks

    junk = "<p>ok</p><a href=" + '"' * 80 + "x"  # unterminated, 80 quotes
    t0 = time.monotonic()
    blocks = parse_blocks(junk)
    assert time.monotonic() - t0 < 1.0
    assert [b.text for b in blocks] == ["ok"]


def test_mixed_case_class_attr_counts():
    """<div Class="..."> must contribute class evidence: the fast-path
    gate lowercases before checking (the regex always matched, but the
    old gate skipped mixed-case attrs entirely)."""
    from gluon_ocr_spark.kernels.dom import parse_blocks

    lower = parse_blocks('<div class="nav-menu"><p>chrome text here</p></div><p>body</p>')
    mixed = parse_blocks('<div Class="nav-menu"><p>chrome text here</p></div><p>body</p>')
    assert [(b.text, b.chain) for b in lower] == [(b.text, b.chain) for b in mixed]
