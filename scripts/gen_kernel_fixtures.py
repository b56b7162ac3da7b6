"""Write the kernel-parity oracle fixtures (fixtures/*.parquet).

Single-process run of the SAME compute functions the Spark queries
execute inside mapInPandas (gluon_ocr_spark/functions/fixture_cases.py)
— the parquet is the DuckDB oracle side of the driver's gate. Re-run
whenever a kernel's pinned semantics intentionally change, and commit
the result; pytest separately pins the kernels to reference-example
values so a silent drift here cannot hide a semantics change.

Usage: python scripts/gen_kernel_fixtures.py
"""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gluon_ocr_spark.functions.fixture_cases import FAMILIES, rows_for  # noqa: E402
from gluon_ocr_spark.operators.kernel_queries import FIXTURE_DIR, SCHEMAS  # noqa: E402

_PA_TYPES = {"bigint": pa.int64(), "double": pa.float64(), "string": pa.string(), "boolean": pa.bool_()}


def main() -> None:
    os.makedirs(FIXTURE_DIR, exist_ok=True)
    for family in FAMILIES:
        rows = rows_for(family)
        fields = [
            pa.field(c.split()[0], _PA_TYPES[c.split()[1]]) for c in SCHEMAS[family].split(", ")
        ]
        schema = pa.schema(fields)
        cols = {f.name: [r[f.name] for r in rows] for f in fields}
        table = pa.table(cols, schema=schema)
        path = os.path.join(FIXTURE_DIR, f"{family}.parquet")
        pq.write_table(table, path)
        print(f"{family}: {len(rows)} rows → {path}")


if __name__ == "__main__":
    main()
