"""Structural extraction assertions on handcrafted realistic pages
(news / wiki / blog / forum shapes NOT produced by our generator) —
the boilerplate-strip semantics must generalize, not just invert the
fixture generator."""

from gluon_ocr_spark.kernels.extract import extract_document

NEWS = b"""<!DOCTYPE html><html><head><title>Quake hits region</title>
<script src="/a.js"></script><style>.x{}</style></head><body>
<header><div class="logo"><a href="/">The Daily Byte</a></div>
<nav><ul><li><a href="/world">World</a></li><li><a href="/tech">Tech</a></li>
<li><a href="/sport">Sport</a></li></ul></nav></header>
<div class="breadcrumbs"><a href="/">Home</a> &gt; <a href="/world">World</a></div>
<main><article>
<h1>Magnitude 6 earthquake strikes coastal region early Tuesday</h1>
<p class="byline"><a href="/u/jdoe">Jane Doe</a>, staff reporter</p>
<p>A strong earthquake shook the coastal region early on Tuesday morning,
rattling windows and waking residents across several towns, officials said.</p>
<p>No serious injuries were reported, though authorities continued to assess
damage to roads and older buildings near the epicenter throughout the day.</p>
<blockquote><p>We felt the whole house sway for about twenty seconds, one
resident told reporters by phone.</p></blockquote>
<p>Seismologists said aftershocks were likely over the coming days and urged
residents to review their emergency preparations.</p>
</article>
<aside class="related"><h3>Related stories</h3>
<ul><li><a href="/1">Last year's tremor</a></li><li><a href="/2">How to prepare</a></li></ul></aside>
</main>
<footer><p>&copy; 2024 The Daily Byte.</p><ul><li><a href="/terms">Terms</a></li>
<li><a href="/privacy">Privacy</a></li></ul></footer>
</body></html>"""

FORUM = b"""<html><body>
<div id="sidebar"><div class="widget"><a href="/hot">Hot threads</a></div></div>
<div class="content"><div class="post-body">
<p>Has anyone managed to get the new firmware running on the older board
revision? I keep hitting a bootloader error at step three and cannot find
any documentation about whether the chip is even supported.</p>
<p>I tried the usual recovery procedure twice and double checked the serial
wiring against the published pinout before giving up for the night.</p>
</div>
<div class="comments"><div class="comment"><a href="/u/1">bob</a>: same here</div></div>
</div></body></html>"""

MINIMAL = b"""<html><body>
<p>Plain page with almost no markup but a real paragraph of content that a
reader would definitely consider the main text of the document.</p>
</body></html>"""


def test_news_page_extraction():
    r = extract_document(NEWS)
    # headline + body paragraphs + quote survive
    assert "Magnitude 6 earthquake strikes" in r.text
    assert "rattling windows" in r.text
    assert "whole house sway" in r.text
    assert "aftershocks were likely" in r.text
    # chrome is stripped
    for boiler in ("The Daily Byte", "World", "Related stories", "Terms", "Privacy", "Home"):
        assert boiler not in r.text, boiler
    # reading order: headline first
    assert r.text.splitlines()[0].startswith("Magnitude 6 earthquake")


def test_forum_page_extraction():
    r = extract_document(FORUM)
    assert "bootloader error" in r.text
    assert "recovery procedure" in r.text
    assert "Hot threads" not in r.text
    assert "same here" not in r.text  # comment chrome


def test_minimal_page_extraction():
    r = extract_document(MINIMAL)
    assert r.text.startswith("Plain page with almost no markup")
    assert len(r.lines) == 1
