"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All real logic lives in ``file_db_spark``; this module only adapts the
package registry (file_db_spark/operators/__init__.py) to the driver's
three-function contract.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# robust under any loader: make the repo importable even when this
# module is loaded by file path with a different working directory
_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from file_db_spark import operators as _ops  # noqa: E402

FLAGSHIP = "a1_pricing_summary"
SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (A1 pricing summary, the dir_detail analog) on
    /root/testdata/sf0.001; driver checks rows>0 and a stable schema."""
    return _ops.QUERIES[FLAGSHIP](spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(_ops.QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracle SQL per query; keys missing here (vs
    ``queries()``) are non-SQL-expressible ops → rows-only check."""
    return dict(_ops.ORACLES)
