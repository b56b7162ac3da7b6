"""Property-based totality/invariant tests for the extraction kernel.

Crawl payloads are adversarial: truncated tags, misnesting, junk
bytes, entities, deep nesting. The kernel must be total (never raise)
and its invariants must hold for arbitrary input.
"""

from hypothesis import given, settings, strategies as st

from gluon_ocr_spark.kernels.blocks import detect_regions
from gluon_ocr_spark.kernels.dom import parse_blocks
from gluon_ocr_spark.kernels.extract import extract_document

TAGS = ["p", "div", "span", "a", "li", "nav", "article", "h1", "script", "table", "br", "main"]


@st.composite
def html_soup(draw):
    """Random tag soup: fragments of open/close tags, text, entities."""
    parts = []
    for _ in range(draw(st.integers(0, 40))):
        kind = draw(st.integers(0, 5))
        t = draw(st.sampled_from(TAGS))
        if kind == 0:
            attrs = draw(st.sampled_from(["", ' class="x y"', ' id="z"', ' href="/a"', ' class=']))
            parts.append(f"<{t}{attrs}>")
        elif kind == 1:
            parts.append(f"</{t}>")
        elif kind == 2:
            parts.append(draw(st.text(max_size=30)))
        elif kind == 3:
            parts.append(draw(st.sampled_from(["&amp;", "&lt;", "&#65;", "&bogus;", "&#x41;"])))
        elif kind == 4:
            parts.append("<!-- comment <p> -->")
        else:
            parts.append(draw(st.sampled_from(["<![CDATA[x]]>", "<?pi ?>", "<!DOCTYPE html>", "<"])))
    return "".join(parts)


@given(html_soup())
@settings(max_examples=150, deadline=None)
def test_kernel_total_on_tag_soup(soup):
    res = extract_document(soup)
    assert isinstance(res.text, str)
    # span invariants
    assert res.text == "\n".join(ln.text for ln in res.lines)
    for ln in res.lines:
        assert res.text[ln.start : ln.end] == ln.text
        assert ln.text == " ".join(ln.text.split())  # normalized, non-empty
        assert ln.text


@given(st.binary(max_size=400))
@settings(max_examples=100, deadline=None)
def test_kernel_total_on_arbitrary_bytes(payload):
    res = extract_document(payload)
    assert isinstance(res.text, str)


@given(html_soup())
@settings(max_examples=60, deadline=None)
def test_blocks_document_order(soup):
    blocks = parse_blocks(soup)
    assert [b.order for b in blocks] == list(range(len(blocks)))
    regions = detect_regions(blocks)
    starts = [r.start_order for r in regions]
    assert starts == sorted(starts)  # canonical reading order


@given(st.text(alphabet=st.characters(blacklist_characters="<&\x00", blacklist_categories=("Cs",)), min_size=1, max_size=200))
@settings(max_examples=100, deadline=None)
def test_plain_text_roundtrip_in_article(txt):
    """Any whitespace-normal text wrapped in a content container comes
    back byte-identically (the generator round-trip, generalized)."""
    norm = " ".join(txt.split())
    if len(norm) < 2:  # below the D4 min-size filter → dropped by contract
        return
    html = f'<main class="content"><article><p>{norm}</p></article></main>'
    assert extract_document(html).text == norm
