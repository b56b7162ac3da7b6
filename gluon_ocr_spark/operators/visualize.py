"""Visualization sink (SURVEY §2.1 S9) — detected boxes → SVG overlays.

The reference's visualization writes box polylines onto page images
(``scripts/detect/db/demo.py`` draw step, cv2.polylines). Without
image codecs in this container the engine emits the same geometry as
standalone SVG documents — viewable in any browser, diffable in tests,
and buildable entirely JVM-side:

* :func:`boxes_to_svg` — pure DataFrame transform: one row per image
  with a complete ``<svg>`` document aggregated from its box rows
  (concat/collect_list expressions; no UDF, no collect).
* :func:`write_svg_files` — the sink: one ``<img_id>.svg`` file per
  image, written executor-side via ``foreachPartition`` (each task
  writes only its partition's files — no driver bottleneck; at scale
  point ``out_dir`` at object storage the same way the reference
  points cv2.imwrite at a results dir).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, functions as F


def boxes_to_svg(
    boxes: DataFrame,
    img_col: str = "img_id",
    coord_cols: tuple[str, ...] = ("c0", "c1", "c2", "c3", "c4", "c5", "c6", "c7"),
    score_col: str | None = "score",
    width: int = 64,
    height: int = 64,
) -> DataFrame:
    """(img_id, c0..c7[, score]) rows → (img_id, svg) documents."""
    pts = F.concat_ws(
        " ",
        *[
            F.concat_ws(",", F.col(coord_cols[i]).cast("int"), F.col(coord_cols[i + 1]).cast("int"))
            for i in range(0, 8, 2)
        ],
    )
    title = (
        F.concat(F.lit("<title>score="), F.round(F.col(score_col), 4).cast("string"), F.lit("</title>"))
        if score_col
        else F.lit("")
    )
    poly = F.concat(
        F.lit('<polygon points="'),
        pts,
        F.lit('" fill="none" stroke="#d33" stroke-width="0.5">'),
        title,
        F.lit("</polygon>"),
    )
    per_img = boxes.select(F.col(img_col).alias("img_id"), poly.alias("poly"))
    # sort_array pins element order: collect_list is nondeterministic
    # across partitionings, and the sink output must hash stably
    # run-to-run (ADVICE r2). The rendered polygon string embeds
    # coords + score, so lexicographic order is a total, stable order.
    return (
        per_img.groupBy("img_id")
        .agg(F.array_join(F.sort_array(F.collect_list("poly")), "\n").alias("polys"))
        .select(
            "img_id",
            F.concat(
                F.lit(
                    f'<svg xmlns="http://www.w3.org/2000/svg" viewBox="0 0 {width} {height}">\n'
                    f'<rect width="{width}" height="{height}" fill="#fff"/>\n'
                ),
                F.col("polys"),
                F.lit("\n</svg>"),
            ).alias("svg"),
        )
    )


def write_svg_files(svg_df: DataFrame, out_dir: str) -> int:
    """Sink: one ``<img_id>.svg`` per row, written by the executors.
    Returns the number of files written (via a count on the same
    pass's input — the write itself is side-effecting per partition)."""
    os.makedirs(out_dir, exist_ok=True)

    def dump(rows) -> None:
        for r in rows:
            path = os.path.join(out_dir, f"{r['img_id']}.svg")
            tmp = path + ".tmp"
            with open(tmp, "w", encoding="utf-8") as fh:
                fh.write(r["svg"])
            os.replace(tmp, path)  # atomic per file

    svg_df.foreachPartition(dump)
    return len([f for f in os.listdir(out_dir) if f.endswith(".svg")])
