"""gluon_ocr_spark — a PySpark-native main-content extraction engine.

A from-scratch re-expression of the reference pipeline's
detect-then-recognize extraction semantics (Davids929/gluon-ocr,
``scripts/deploy/python_infer/demo.py``) over Common-Crawl-style web
pages ``(url, warc_ts, html, text, lang)``:

* **detect**   — parse the ``html`` payload into DOM text blocks and
  score each block's main-content probability
  (:mod:`gluon_ocr_spark.kernels.dom`,
  :mod:`gluon_ocr_spark.kernels.blocks`), mirroring the reference's
  DB probability-map + threshold/filter post-process
  (``gluonocr/post_process/db_postprocess.py``).
* **recognize** — emit the text of each surviving region as a "line"
  in canonical reading order and assemble the document text as
  ``'\\n'.join(lines)`` with span offsets
  (:mod:`gluon_ocr_spark.kernels.extract`), the engine-pinned T5
  contract of SURVEY.md §2.6.

Everything heavy runs inside batched pandas/Arrow UDFs
(``mapInPandas``); the relational shell (scan → column-prune →
salt/range-partition → UDF → write → lineage commit) is stock
DataFrame API so Catalyst keeps pruning/pushdown.

The kernels are pure Python/NumPy and double as the single-process
oracle used by the test suite, so Spark output is byte-identical to
the oracle by construction; the tests then assert the nontrivial
part — invariance under partitioning/parallelism — plus
checkpoint/resume exactly-once semantics.
"""

__version__ = "0.1.0"
