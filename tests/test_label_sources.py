"""S3/S4 label-corpus scans (detect_dataset._load_ann,
recog_dataset._get_items semantics)."""

from gluon_ocr_spark.sources.labels import (
    parse_detect_label_line,
    read_detect_labels,
    read_recog_labels,
)


DET_LINES = [
    "10,20,110,20,110,60,10,60,hello world",
    "5,5,50,5,50,25,5,25,###",           # ignore sentinel
    "1,1,9,1,9,9,1,9,",                  # empty text → ignore
    "30,30,60,30,60,50,30,50,a,b,c",     # commas INSIDE the text
    "zzz,1,2,3,4,5,6,7,bad",             # unparseable coords → dropped
]


def test_parse_detect_label_line_kernel():
    poly, ign = parse_detect_label_line(DET_LINES[0])
    assert poly.tolist() == [[10, 20], [110, 20], [110, 60], [10, 60]]
    assert not ign
    assert parse_detect_label_line(DET_LINES[1])[1] is True
    assert parse_detect_label_line(DET_LINES[4]) is None
    # commas in text are rejoined
    _, ign3 = parse_detect_label_line(DET_LINES[3])
    assert not ign3


def test_read_detect_labels_matches_kernel(spark, tmp_path):
    p = tmp_path / "labels" / "img_001.txt"
    p.parent.mkdir()
    p.write_text("\n".join(DET_LINES) + "\n")
    rows = read_detect_labels(spark, str(tmp_path / "labels")).collect()
    assert len(rows) == 4  # bad-coords line dropped
    by_text = {r["text"]: r for r in rows}
    assert by_text["hello world"]["x1"] == 110.0 and not by_text["hello world"]["ignore"]
    assert by_text["###"]["ignore"] and by_text[""]["ignore"]
    assert by_text["a,b,c"]["y3"] == 50.0  # comma-containing text intact


def test_read_recog_labels_filters(spark, tmp_path):
    p = tmp_path / "lines.txt"
    p.write_text(
        "img/a.png\thello\n"
        "img/b.png\t###\n"          # sentinel → dropped
        "noseparator\n"             # <2 fields → dropped
        "img/c.png\t\n"             # empty label → dropped
        "img/d.png\t" + "x" * 99 + "\n"  # too long → dropped
        "img/e.png\tok\textra\n"    # extra fields: label is field 2
    )
    rows = {r["img_path"]: r["label"] for r in read_recog_labels(spark, str(p), max_len=60).collect()}
    assert rows == {"img/a.png": "hello", "img/e.png": "ok"}
