"""Frozen golden snapshot of the extraction contract.

Guards against silent behavior drift across refactors/rounds: any
intentional change to the kernel's output must consciously regenerate
``tests/golden_docs.json`` (command in the assert message).
"""

import hashlib
import json
import os

from gluon_ocr_spark.kernels.extract import extract_document
from gluon_ocr_spark.sources.pages import make_pages

GOLDEN = os.path.join(os.path.dirname(__file__), "golden_docs.json")

REGEN = (
    "kernel output changed vs tests/golden_docs.json — if intentional, "
    "regenerate via the snippet in that file's git history / test docstring"
)


def test_golden_snapshot():
    golden = json.load(open(GOLDEN))
    pages = {p["url"]: p for p in make_pages(50, 42)}
    assert set(golden) == set(pages)
    for url, exp in golden.items():
        r = extract_document(pages[url]["html"])
        assert hashlib.md5(r.text.encode()).hexdigest() == exp["text_md5"], f"{url}: {REGEN}"
        assert len(r.lines) == exp["n_lines"], f"{url}: {REGEN}"
        if exp["score0"] is not None:
            assert abs(r.lines[0].score - exp["score0"]) < 1e-9, f"{url}: {REGEN}"
