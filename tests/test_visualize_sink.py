"""S9 visualization sink: detection boxes → SVG overlay files."""

import os

from gluon_ocr_spark.operators.kernel_queries import kernel_queries
from gluon_ocr_spark.operators.visualize import boxes_to_svg, write_svg_files


def test_svg_sink_end_to_end(spark, tmp_path):
    # real detector output: the DBNet kernel query's boxes
    boxes = kernel_queries()["kernel_dbnet_boxes"](spark, "")
    boxes = boxes.where("box_id >= 0")
    svg = boxes_to_svg(boxes)
    out = str(tmp_path / "viz")
    n = write_svg_files(svg, out)
    assert n == svg.count() > 0
    sample = sorted(os.listdir(out))[0]
    body = open(os.path.join(out, sample)).read()
    assert body.startswith("<svg ") and body.endswith("</svg>")
    assert "<polygon points=" in body and "score=" in body


def test_svg_plan_is_jvm_side(spark):
    # the transform must stay in Catalyst: no Python-UDF nodes
    boxes = kernel_queries()["kernel_dbnet_boxes"](spark, "").where("box_id >= 0")
    plan = boxes_to_svg(boxes)._jdf.queryExecution().executedPlan().toString()
    # the UDF edge belongs to the upstream detector, not the SVG build
    assert plan.count("MapInPandas") <= 1
    assert "BatchEvalPython" not in plan
