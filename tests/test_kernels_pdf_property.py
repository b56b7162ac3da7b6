"""Property tests for the PDF leg: encode→parse round-trip over
arbitrary printable text and every encoder variant, plus totality of
the parser over arbitrary object syntax."""

from hypothesis import given, settings, strategies as st

from gluon_ocr_spark.kernels.pdf import (
    _Parser,
    encode_pdf,
    pdf_extract_text,
    pdf_text_lines,
)

# printable ASCII without leading/trailing-space ambiguity: the doc
# assembly contract preserves interior bytes exactly; leading/trailing
# spaces on a LINE survive too (only fully-blank lines drop)
_line_text = (
    st.text(
        alphabet=st.characters(min_codepoint=0x20, max_codepoint=0x7E),
        min_size=1,
        max_size=60,
    )
    .map(lambda s: s.strip())
    .filter(lambda s: s and "  " not in s)
)

_unicode_line = (
    st.text(
        alphabet=st.characters(
            codec="utf-8", categories=("L", "N", "P", "S"), min_codepoint=0x20
        ),
        min_size=1,
        max_size=30,
    )
    .map(lambda s: " ".join(s.split()))
    .filter(lambda s: s and "  " not in s)
)

_VARIANTS = [
    {"variant": "td"},
    {"variant": "td", "compress": False},
    {"variant": "tm"},
    {"variant": "td", "hex_strings": True},
    {"variant": "tm", "xref_stream": True},
    {"variant": "td", "xref_stream": True, "objstm": True, "predictor": True},
]


@settings(max_examples=60, deadline=None)
@given(
    lines=st.lists(_line_text, min_size=1, max_size=8),
    variant=st.sampled_from(range(len(_VARIANTS))),
)
def test_roundtrip_arbitrary_ascii_lines(lines, variant):
    """Any printable-ASCII single-spaced lines survive the full PDF
    byte round-trip under every structural encoder variant (escaping,
    filters, xref forms are content-independent)."""
    runs = [[(72.0, 700.0 - 20.0 * k, 10.0, t) for k, t in enumerate(lines)]]
    payload = encode_pdf(runs, **_VARIANTS[variant])
    assert pdf_extract_text(payload) == "\n".join(lines)


@settings(max_examples=40, deadline=None)
@given(lines=st.lists(_unicode_line, min_size=1, max_size=5))
def test_roundtrip_arbitrary_unicode_type0(lines):
    """Arbitrary unicode through the Type0/Identity-H + ToUnicode
    path: CID assignment and bfchar mapping must invert exactly."""
    runs = [[(72.0, 700.0 - 20.0 * k, 12.0, t) for k, t in enumerate(lines)]]
    payload = encode_pdf(runs, unicode_font=True)
    assert pdf_extract_text(payload) == "\n".join(lines)


@settings(max_examples=80, deadline=None)
@given(data=st.binary(max_size=200))
def test_object_parser_total(data):
    """parse_object over arbitrary bytes either returns a value or
    raises ValueError — never crashes with anything else."""
    p = _Parser(data)
    try:
        p.parse_object()
    except ValueError:
        pass


@settings(max_examples=40, deadline=None)
@given(data=st.binary(max_size=300))
def test_extract_total_on_pdf_prefixed_junk(data):
    pdf_extract_text(b"%PDF-1.4\n" + data)


@settings(max_examples=30, deadline=None)
@given(
    lines=st.lists(_line_text, min_size=2, max_size=6),
    seed=st.integers(0, 2**31),
)
def test_reading_order_invariant_under_emission_shuffle(lines, seed):
    """Emission order in the content stream must never affect the
    extracted reading order (geometry decides)."""
    import random as _random

    runs = [(72.0, 700.0 - 20.0 * k, 10.0, t) for k, t in enumerate(lines)]
    shuffled = list(runs)
    _random.Random(seed).shuffle(shuffled)
    a = pdf_text_lines(encode_pdf([runs], variant="tm"))
    b = pdf_text_lines(encode_pdf([shuffled], variant="tm"))
    assert [ln.text for ln in a] == [ln.text for ln in b]
