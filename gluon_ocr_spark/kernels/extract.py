"""End-to-end page → (text, lines, spans) extraction kernel.

The single-process oracle AND the body of the Spark UDF — one code
path, so the distributed pipeline is byte-identical to the oracle by
construction (the tests then check partition-invariance).

Mirrors the reference's end-to-end ``OCRModel.inference``
(``scripts/deploy/python_infer/demo.py:156-175``):

1. decode payload (S2)            → :func:`gluon_ocr_spark.kernels.dom.parse_blocks`
2. detect + post-process (N1, D*) → :func:`gluon_ocr_spark.kernels.blocks.detect_regions`
3. per-region "recognition" (C1→T2 analog): each surviving region's
   blocks become lines of text
4. doc assembly (T5): ``'\\n'.join(line texts)`` in reading order with
   span offsets — the engine-pinned byte-identical contract
   (SURVEY.md §2.6 T5, FIXTURES.md §5).
"""

from __future__ import annotations

from dataclasses import dataclass

from .blocks import DEFAULT_CONFIG, ExtractionConfig, detect_regions
from .dom import parse_blocks


@dataclass
class Line:
    line_id: int  # reading-order index (C2)
    start: int  # char offset of this line in the doc text
    end: int  # exclusive end offset
    score: float  # region score (D5), float32-rounded for stability
    tag: str  # originating block tag
    order: int  # DOM document-order index of the block
    text: str


@dataclass
class ExtractResult:
    text: str
    lines: list[Line]


def extract_document(html: bytes | str, cfg: ExtractionConfig = DEFAULT_CONFIG) -> ExtractResult:
    """Extract the main content of one page. Total: never raises on
    arbitrary crawl bytes; empty input → empty result."""
    blocks = parse_blocks(html)
    regions = detect_regions(blocks, cfg)

    lines: list[Line] = []
    offset = 0
    line_id = 0
    for region in regions:
        for b in region.blocks:
            start = offset
            end = start + len(b.text)
            lines.append(
                Line(
                    line_id=line_id,
                    start=start,
                    end=end,
                    # float32 round-trip: the reference carries float32
                    # scores end-to-end; pin the same width so golden
                    # files are stable across platforms.
                    score=_f32(region.score),
                    tag=b.tag,
                    order=b.order,
                    text=b.text,
                )
            )
            offset = end + 1  # the joining '\n'
            line_id += 1
    text = "\n".join(ln.text for ln in lines)
    return ExtractResult(text=text, lines=lines)


def _f32(x: float) -> float:
    import struct

    return struct.unpack("f", struct.pack("f", x))[0]
