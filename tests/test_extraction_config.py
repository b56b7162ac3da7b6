"""Tunable ExtractionConfig (reference CLI-knob analog) end to end."""

from gluon_ocr_spark.kernels.blocks import ExtractionConfig
from gluon_ocr_spark.kernels.extract import extract_document

HTML = (
    b'<main class="content"><article>'
    b"<p>ok</p>"
    b"<p>a much longer paragraph with plenty of content words in it</p>"
    b"</article></main>"
)


def test_min_chars_threshold_drops_short_lines():
    default = extract_document(HTML)
    assert default.text.splitlines()[0] == "ok"

    strict = ExtractionConfig(min_chars=5, min_area_chars=5)
    got = extract_document(HTML, strict)
    # D2 merges adjacent kept blocks into one region, so tightening the
    # size gates only drops the short line when it stands alone
    solo = extract_document(b'<main class="content"><article><p>ok</p></article></main>', strict)
    assert solo.text == ""
    assert "longer paragraph" in got.text


def test_prob_thresh_sweep_monotone():
    texts = []
    for t in (0.1, 0.3, 0.9):
        cfg = ExtractionConfig(prob_thresh=t, box_thresh=t)
        texts.append(extract_document(HTML, cfg).text)
    # raising thresholds never ADDS content
    assert len(texts[0]) >= len(texts[1]) >= len(texts[2])


def test_spark_operator_accepts_config(spark):
    import pandas as pd

    from gluon_ocr_spark.operators.extract import extract_docs

    df = spark.createDataFrame(pd.DataFrame({"url": ["u1"], "html": [HTML]}))
    strict = ExtractionConfig(prob_thresh=0.99, box_thresh=0.99)
    out = extract_docs(df, cfg=strict).collect()
    assert out[0]["text"] == ""  # nothing clears a 0.99 bar
    default_out = extract_docs(df).collect()
    assert "longer paragraph" in default_out[0]["text"]
