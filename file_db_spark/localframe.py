"""Arrow-backed local DataFrames: driver-literal rows as LocalTableScan.

``spark.createDataFrame(list_of_rows)`` builds a *Python RDD* sliced to
``defaultParallelism``: every action that touches the frame round-trips
that many Python workers (task launch + fork/handshake + pickle), and
the rows re-evaluate on EVERY action because an RDD scan is not a plan
literal. Thread dumps of the g3456 suite showed 157/~180 busy executor
samples parked in ``BasePythonRunner.read`` — tiny meta/probe frames
were the single largest consumer of task time (run >> cpu, guide §4).

Routing the same rows through a ``pyarrow.Table`` makes Catalyst embed
them as a ``LocalTableScan`` (a plan literal): zero Python workers at
execution, zero re-evaluation, one partition. This is the guide §4 move
("eliminate the JVM<->Python boundary") applied to driver-side literal
rows instead of UDFs.

``local_df`` is a drop-in replacement for ``createDataFrame(rows,
schema)`` for scalar schemas (string/int/long/double/boolean/
timestamp). On any conversion surprise it silently falls back to the
vanilla path, so behavior can never diverge — only speed.
"""

from __future__ import annotations

from typing import Iterable, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

__all__ = ["local_df"]


def local_df(
    spark: SparkSession,
    rows: Iterable[Sequence],
    schema: str | StructType,
) -> DataFrame:
    """``spark.createDataFrame(rows, schema)`` as a LocalTableScan.

    ``rows``: iterable of tuples/lists/Rows in schema field order.
    ``schema``: DDL string or StructType. Values cross to the JVM once,
    as one Arrow batch, at plan-build time.
    """
    data = [tuple(r) for r in rows]
    try:
        import pyarrow as pa
        from pyspark.sql.pandas.types import to_arrow_schema

        st = (
            StructType.fromDDL(schema) if isinstance(schema, str) else schema
        )
        if not isinstance(st, StructType):
            return spark.createDataFrame(data, schema)
        pa_schema = to_arrow_schema(st)
        cols = (
            list(zip(*data)) if data else [[] for _ in pa_schema]
        )
        arrays = [
            pa.array(list(col), type=field.type)
            for col, field in zip(cols, pa_schema)
        ]
        tbl = pa.Table.from_arrays(arrays, schema=pa_schema)
        out = spark.createDataFrame(tbl)
        # the Arrow path must reproduce the requested schema exactly
        # (names + types; nullability is advisory on literal frames) —
        # otherwise hand the rows to the vanilla path untouched.
        if [(f.name, f.dataType) for f in out.schema.fields] != [
            (f.name, f.dataType) for f in st.fields
        ]:
            return spark.createDataFrame(data, schema)
        return out
    except Exception:
        return spark.createDataFrame(data, schema)
