"""No queries() entry may return a DECIMAL-typed column.

Spark's toPandas materializes DECIMAL as decimal.Decimal (trailing zeros
kept: Decimal('400000.10')) while DuckDB's client returns float64
(400000.1) — identical values, different string/hash representations, so
any DECIMAL output column can flip the driver's hash on ~1 in 10 rows
(round-5 q18, the only red driver row). The local oracle mimic
float-coerces before comparing and can never catch this class — this
schema-level guard does. Exact DECIMAL *aggregation* stays (that is the
cross-engine-exact math); only the OUTPUT must be cast to DOUBLE
(q22_global_sales pattern, oracle.py:2253).
"""
from __future__ import annotations

import pyspark.sql.types as T
import pytest

import __spark_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.001"


def test_no_decimal_output_columns(spark):
    offenders = {}
    for name, fn in entrymod.queries().items():
        df = fn(spark, SF_DIR)
        decs = [
            f.name for f in df.schema.fields
            if isinstance(f.dataType, T.DecimalType)
        ]
        if decs:
            offenders[name] = decs
    assert not offenders, (
        "queries returning DECIMAL columns (driver-hash trap, see module "
        f"docstring): {offenders}"
    )
