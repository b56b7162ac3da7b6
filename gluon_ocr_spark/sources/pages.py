"""Deterministic synthetic Common-Crawl-style page corpus.

Produces the ``input_hint`` table shape
``pages(url string, warc_ts timestamp, html binary, text string, lang string)``
(FIXTURES.md §1) with:

* seeded, fully deterministic content — same (seed, n) ⇒ same bytes;
* realistic boilerplate chrome (nav / header / cookie banner / sidebar /
  ads / footer) around a known main-content body, so the extraction
  pipeline has real work to do;
* a **round-trip guarantee**: the generated ``text`` column is exactly
  what :func:`gluon_ocr_spark.kernels.extract.extract_document` must
  return for the page — the ground-truth for the byte-identical gate;
* heavy-tailed page sizes (Pareto-ish paragraph counts and a small
  fraction of giant pages) to exercise the skew salting required by
  the north rule.

The generator is pure Python (no Spark import) so the oracle tests and
the Spark source share it; :func:`pages_dataframe` materializes it as
a Spark DataFrame via ``mapInPandas`` over an id range — generation
happens ON EXECUTORS (no driver-side collect), so the bench corpus
scales horizontally like a real Iceberg scan would.
"""

from __future__ import annotations

import datetime as _dt
import html as _html
import random

WORDS = (
    "the quick brown fox jumps over lazy dog crawl web page content extraction "
    "spark engine shuffle partition column vector batch stream query plan scan "
    "filter join group order window merge sort hash data table row value key "
    "large scale corpus document language model token text main article news"
).split()

BOILER_LINKS = [
    "Home",
    "About",
    "Contact",
    "Products",
    "Careers",
    "Blog",
    "Terms",
    "Privacy",
    "Sitemap",
    "Login",
    "Register",
    "Help",
]

LANGS = ["en", "en", "en", "de", "fr", "es", "zh"]  # en-skewed like a crawl

_EPOCH = _dt.datetime(2024, 3, 1, 0, 0, 0)


def _sentence(rng: random.Random, lo: int = 6, hi: int = 16) -> str:
    return " ".join(rng.choice(WORDS) for _ in range(rng.randint(lo, hi)))


def _paragraph(rng: random.Random) -> str:
    return " ".join(_sentence(rng) for _ in range(rng.randint(1, 4)))


def _render_para(rng: random.Random, p: str) -> str:
    """Render one content line with realistic inline structure, chosen
    deterministically. Every variant preserves the visible text
    byte-for-byte (inline tags don't split blocks; entities round-trip
    through escape/unescape; blockquote wraps a single block)."""
    kind = rng.random()
    esc = _html.escape(p)
    if kind < 0.15:
        # inline emphasis on a word span
        words = esc.split(" ")
        if len(words) >= 4:
            i = rng.randrange(0, len(words) - 2)
            tag = rng.choice(("b", "em", "strong", "code"))
            words[i] = f"<{tag}>{words[i]}"
            words[i + 1] = f"{words[i + 1]}</{tag}>"
            esc = " ".join(words)
        return f"<p>{esc}</p>"
    if kind < 0.25:
        return f"<blockquote><p>{esc}</p></blockquote>"
    if kind < 0.32:
        # short inline link inside the paragraph (low link density)
        words = esc.split(" ")
        if len(words) >= 6:
            i = rng.randrange(0, len(words) - 1)
            words[i] = f'<a href="/w/{i}">{words[i]}</a>'
            esc = " ".join(words)
        return f"<p>{esc}</p>"
    return f"<p>{esc}</p>"


def render_page_html(rng: random.Random, paras: list[str], title: str | None = None) -> str:
    """Render main-content paragraphs (+ optional title) inside
    deterministic boilerplate chrome. The extraction contract: the
    pipeline must recover exactly ``'\\n'.join([title?] + paras)``."""
    # --- boilerplate chrome ---
    nav = "".join(f'<li><a href="/{w.lower()}">{w}</a></li>' for w in rng.sample(BOILER_LINKS, 6))
    side = "".join(
        f'<div class="widget"><a href="#{i}">{_sentence(rng, 2, 5)}</a></div>' for i in range(rng.randint(2, 5))
    )
    ads = f'<div class="ad banner"><a href="/buy">{_sentence(rng, 3, 8)}</a></div>'
    cookie = '<div id="cookie-consent">We use cookies. <a href="/accept">Accept</a></div>'
    footer = (
        '<footer><ul class="footer-links">'
        + "".join(f'<li><a href="/f{i}">{w}</a></li>' for i, w in enumerate(rng.sample(BOILER_LINKS, 4)))
        + "<table><tr><td>Region</td><td>Office</td></tr>"
        + f"<tr><td>{_sentence(rng, 1, 2)}</td><td>{_sentence(rng, 1, 2)}</td></tr></table>"
        + f"</ul><p>© 2024 {_sentence(rng, 2, 3)}. All rights reserved.</p></footer>"
    )
    comments = (
        '<section class="comments"><h3>Comments</h3>'
        + "".join(f'<div class="comment"><a href="/u{i}">user{i}</a> says ok</div>' for i in range(rng.randint(0, 3)))
        + "</section>"
    )

    # paragraphs, with occasional runs rendered as <ul><li> groups —
    # each <li> is its own block ⇒ its own output line, so the
    # '\n'.join(paras) ground truth is preserved verbatim
    chunks: list[str] = []
    i = 0
    while i < len(paras):
        if rng.random() < 0.1 and i + 3 <= len(paras):
            items = "".join(f"<li>{_html.escape(q)}</li>" for q in paras[i : i + 3])
            chunks.append(f"<ul>{items}</ul>")
            i += 3
        else:
            chunks.append(_render_para(rng, paras[i]))
            i += 1
    body_paras = "".join(chunks)
    h1 = f"<h1>{_html.escape(title)}</h1>" if title is not None else ""
    page_title = _html.escape(title) if title is not None else "ExampleSite"
    return (
        "<!DOCTYPE html><html><head>"
        f"<title>{page_title} | ExampleSite</title>"
        '<meta charset="utf-8"><script>var x=1;</script>'
        "<style>.ad{color:red}</style></head><body>"
        f'<header><h1 class="site-logo"><a href="/">ExampleSite</a></h1></header>'
        f'{cookie}<nav class="navbar main-menu"><ul>{nav}</ul></nav>'
        '<div class="layout">'
        f'<aside class="sidebar">{side}</aside>'
        '<main class="content"><article class="post">'
        f"{h1}{ads}{body_paras}"
        f"</article>{comments}</main>"
        f"</div>{footer}</body></html>"
    )


def make_page(page_id: int, seed: int = 42) -> dict:
    """Build one page deterministically from (seed, page_id)."""
    rng = random.Random((seed << 20) ^ page_id)
    lang = rng.choice(LANGS)

    # --- main content (ground truth) ---
    title = _sentence(rng, 3, 7).title()
    # heavy tail: most pages a few paragraphs, some huge (skew driver)
    r = rng.random()
    if r < 0.02:
        n_paras = rng.randint(120, 400)  # giant page
    elif r < 0.2:
        n_paras = rng.randint(20, 60)
    else:
        n_paras = rng.randint(1, 8)
    paras = [_paragraph(rng) for _ in range(n_paras)]
    truth = "\n".join([title] + paras)
    doc = render_page_html(rng, paras, title=title)

    host = f"site{page_id % 997:03d}.example.{lang if lang != 'zh' else 'cn'}"
    return {
        "url": f"https://{host}/p/{page_id:09d}",
        "warc_ts": _EPOCH + _dt.timedelta(seconds=(page_id * 37) % 31_536_000),
        "html": doc.encode("utf-8"),
        "text": truth,
        "lang": lang,
    }


def make_pages(n: int, seed: int = 42) -> list[dict]:
    return [make_page(i, seed) for i in range(n)]


PAGES_SCHEMA = "url string, warc_ts timestamp, html binary, text string, lang string"


def pages_dataframe(spark, n: int, seed: int = 42, partitions: int | None = None, payload: str = "html"):
    """Distributed pages source: generation runs on executors via
    ``mapInPandas`` over ``spark.range`` — the local stand-in for the
    Iceberg `pages` scan, shaped so swapping in
    ``spark.read.format("iceberg")`` is a one-line change.

    ``payload`` selects the synthetic byte format: ``html`` (chrome
    around the truth text), ``pdf`` (a real PDF of the truth text,
    one line per paragraph), or ``mixed`` (page_id parity — the shape
    of an actual crawl, where the extraction sniff routes per row).
    The ``text`` column stays the ground truth either way; for PDF
    payloads extraction recovers it because each paragraph is a page
    line and assembly joins lines with newlines (the same contract
    the HTML leg pins)."""
    import pandas as pd

    if partitions is None:
        partitions = max(1, spark.sparkContext.defaultParallelism)

    def _payload_bytes(i: int, r: dict) -> bytes:
        kind = payload if payload != "mixed" else ("pdf" if i % 2 else "html")
        if kind != "pdf":
            return r["html"]
        from ..kernels.pdf import encode_pdf

        runs = [
            (72.0, 740.0 - 14.0 * k, 10.0, line)
            for k, line in enumerate(r["text"].split("\n"))
        ]
        return encode_pdf([runs], xref_stream=bool(i % 4 == 3))

    def gen(batches):
        for pdf in batches:
            rows = [(int(i), make_page(int(i), seed)) for i in pdf["id"]]
            yield pd.DataFrame(
                {
                    "url": [r["url"] for _i, r in rows],
                    "warc_ts": [r["warc_ts"] for _i, r in rows],
                    "html": [_payload_bytes(i, r) for i, r in rows],
                    "text": [r["text"] for _i, r in rows],
                    "lang": [r["lang"] for _i, r in rows],
                }
            )

    return spark.range(0, n, 1, partitions).mapInPandas(gen, schema=PAGES_SCHEMA)


def wrap_text_as_page(doc_id: int, text: str) -> bytes:
    """Embed a known main-content text into full boilerplate chrome,
    deterministically from doc_id. Extraction must recover ``text``
    byte-identically (paragraphs = text split on newlines; no title)."""
    rng = random.Random(0x5EED ^ (doc_id * 2654435761 % (1 << 32)))
    paras = text.split("\n")
    return render_page_html(rng, paras, title=None).encode("utf-8")


def wrap_documents(docs, id_col: str = "doc_id", text_col: str = "text"):
    """documents(doc_id, text, …) → pages(doc_id, url, html).

    Arrow-batched (mapInPandas); used by the driver-facing round-trip
    query: wrap → extract must be the identity on `text`.
    """
    import pandas as pd

    def gen(batches):
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "url": [f"doc://{i}" for i in pdf[id_col]],
                    "html": [wrap_text_as_page(int(i), t) for i, t in zip(pdf[id_col], pdf[text_col])],
                }
            )

    return docs.select(id_col, text_col).mapInPandas(gen, schema="doc_id bigint, url string, html binary")


def wrap_text_as_pdf(doc_id: int, text: str) -> bytes:
    """Embed a known text into a real PDF byte stream, deterministically
    from doc_id — the PDF twin of :func:`wrap_text_as_page` for the
    north rule's "PDF/layout parse" leg. The encoder variant cycles on
    doc_id so the corpus-level gate exercises classic xref, Tm
    positioning, TJ kern-gap word spacing, and xref-stream + ObjStm
    files in one query. Extraction must recover ``text``
    byte-identically (ASCII corpus; single-spaced — the TJ variant
    re-derives word gaps through the documented 0.18-em gap rule)."""
    from ..kernels.pdf import encode_pdf

    variant_kw = [
        {"variant": "td"},
        {"variant": "tm"},
        {"variant": "tjarr"},
        {"variant": "td", "xref_stream": True, "objstm": True},
    ][doc_id % 4]
    runs = [(72.0, 700.0, 10.0, text)]
    return encode_pdf([runs], **variant_kw)


def wrap_documents_pdf(docs, id_col: str = "doc_id", text_col: str = "text"):
    """documents(doc_id, text, …) → pages(doc_id, url, html) with PDF
    payloads; Arrow-batched like :func:`wrap_documents`."""
    import pandas as pd

    def gen(batches):
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "url": [f"doc://{i}" for i in pdf[id_col]],
                    "html": [
                        wrap_text_as_pdf(int(i), t) for i, t in zip(pdf[id_col], pdf[text_col])
                    ],
                }
            )

    return docs.select(id_col, text_col).mapInPandas(gen, schema="doc_id bigint, url string, html binary")
