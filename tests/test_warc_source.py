"""WARC source: round-trip, gzip framing, malformed tolerance,
Spark reader → extraction parity."""

from gluon_ocr_spark.kernels.extract import extract_document
from gluon_ocr_spark.sources.pages import make_pages
from gluon_ocr_spark.sources.warc import parse_warc, read_warc, write_warc


def test_warc_roundtrip_plain_and_gzip():
    pages = make_pages(12, seed=42)
    for compress in (False, True):
        data = write_warc(pages, compress=compress)
        got = list(parse_warc(data))
        assert [r["url"] for r in got] == [p["url"] for p in pages]
        assert [r["html"] for r in got] == [p["html"] for p in pages]
        assert got[0]["warc_ts"].year == 2024


def test_warc_malformed_tolerant():
    pages = make_pages(3, seed=7)
    data = write_warc(pages)
    # corrupt: junk prefix, truncated tail record
    data = b"garbage bytes" + data[: len(data) - 40]
    got = list(parse_warc(data))
    assert 1 <= len(got) <= 3
    assert all(r["url"].startswith("https://") for r in got)
    # total on pure junk
    assert list(parse_warc(b"not a warc at all")) == []
    assert list(parse_warc(b"")) == []


def test_read_warc_spark_extraction_parity(spark, tmp_path):
    pages = make_pages(25, seed=42)
    wdir = tmp_path / "warc"
    wdir.mkdir()
    (wdir / "part-0.warc").write_bytes(write_warc(pages[:13]))
    (wdir / "part-1.warc.gz").write_bytes(write_warc(pages[13:], compress=True))

    from gluon_ocr_spark.operators.extract import extract_docs

    df = read_warc(spark, str(wdir / "*"))
    docs = {r["url"]: r["text"] for r in extract_docs(df).collect()}
    exp = {p["url"]: extract_document(p["html"]).text for p in pages}
    assert docs == exp


def test_write_warc_str_payload():
    """str html payloads are encoded utf-8 (bytes(str) used to raise)."""
    from gluon_ocr_spark.sources.warc import parse_warc, write_warc

    raw = write_warc([{"url": "http://e/x", "warc_ts": None, "html": "<p>héllo</p>"}])
    recs = list(parse_warc(raw))
    assert len(recs) == 1
    assert "héllo" in recs[0]["html"].decode("utf-8")


def test_warc_with_pdf_payloads_extracts(spark, tmp_path):
    """PDF documents inside WARC archives (the actual Common-Crawl
    shape for application/pdf responses) extract through the same
    pipeline: WARC framing → payload sniff → PDF leg."""
    from gluon_ocr_spark.kernels.pdf import encode_pdf
    from gluon_ocr_spark.operators.extract import extract_docs

    pages = []
    for i in range(8):
        lines = [f"pdf doc {i} line {k}" for k in range(1 + i % 3)]
        payload = encode_pdf(
            [[(72.0, 700.0 - 20 * k, 10.0, t) for k, t in enumerate(lines)]],
            xref_stream=bool(i % 2),
        )
        pages.append({"url": f"https://pdfs.example.com/{i}.pdf", "html": payload,
                      "expected": "\n".join(lines)})
    # mix in an HTML record to prove per-record routing
    html_pages = make_pages(3, seed=42)
    records = [{"url": p["url"], "html": p["html"]} for p in pages] + html_pages
    wdir = tmp_path / "warc"
    wdir.mkdir()
    (wdir / "mixed.warc.gz").write_bytes(write_warc(records, compress=True))

    docs = {r["url"]: r["text"] for r in extract_docs(read_warc(spark, str(wdir / "*"))).collect()}
    for p in pages:
        assert docs[p["url"]] == p["expected"]
    for p in html_pages:
        assert docs[p["url"]] == extract_document(p["html"]).text
