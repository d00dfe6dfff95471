r"""SQL-callable surface for the scalar path library (SURVEY §2.11).

The reference exposes its scalar functions as PL/pgSQL — callable from
any SQL string (FileDbDAL/SQLUtil.py:14-61, Directory.py:196-358).
The Spark-native analog is NOT ``spark.udf.register`` (that would be a
row-at-a-time Python UDF — the slow path): Spark 4 SQL-body functions
(``CREATE TEMPORARY FUNCTION ... RETURN <expr>``) are inlined by
Catalyst into the calling plan, so the registered forms run inside
whole-stage codegen exactly like the Column-expression originals in
``functions/paths.py`` — one semantics, two call surfaces.

Register once per session with :func:`register_sql_functions`; every
function is prefixed ``fdb_`` to keep the session namespace clean.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

__all__ = ["register_sql_functions", "SQL_FUNCTIONS"]

# NOTE: Spark SQL single-quoted literals process backslash escapes, so
# a Java-regex backslash needs four here.
SQL_FUNCTIONS: dict[str, str] = {
    # F1 basepath — lookbehind keeps "/x" -> "/"-root semantics; bare
    # drive results re-gain their backslash (paths.py:74-82)
    "fdb_basepath": r"""
        CREATE OR REPLACE TEMPORARY FUNCTION fdb_basepath(p STRING)
        RETURNS STRING RETURN
        CASE WHEN regexp_replace(p, '(?<=.)[/\\\\][^/\\\\]+$', '') LIKE '%:'
             THEN concat(regexp_replace(p, '(?<=.)[/\\\\][^/\\\\]+$', ''), '\\')
             ELSE regexp_replace(p, '(?<=.)[/\\\\][^/\\\\]+$', '') END
    """,
    # F2 basename
    "fdb_basename": r"""
        CREATE OR REPLACE TEMPORARY FUNCTION fdb_basename(p STRING)
        RETURNS STRING RETURN regexp_replace(p, '^.+[/\\\\]', '')
    """,
    # F3 extension — dotless names return the whole lowered name (quirk)
    "fdb_extension": r"""
        CREATE OR REPLACE TEMPORARY FUNCTION fdb_extension(p STRING)
        RETURNS STRING RETURN lower(regexp_replace(p, '^.+\\.', ''))
    """,
    # F4 path_join — reference SQL always joins with a backslash
    "fdb_path_join": r"""
        CREATE OR REPLACE TEMPORARY FUNCTION fdb_path_join(d STRING, n STRING)
        RETURNS STRING RETURN concat(d, '\\', n)
    """,
    # F5 storage converters (decimal, to the MB unit of file.size)
    "fdb_kb": "CREATE OR REPLACE TEMPORARY FUNCTION fdb_kb(x DOUBLE) RETURNS DOUBLE RETURN x / 1000.0",
    "fdb_mb": "CREATE OR REPLACE TEMPORARY FUNCTION fdb_mb(x DOUBLE) RETURNS DOUBLE RETURN x / 1.0",
    "fdb_gb": "CREATE OR REPLACE TEMPORARY FUNCTION fdb_gb(x DOUBLE) RETURNS DOUBLE RETURN x / 0.001",
    "fdb_tb": "CREATE OR REPLACE TEMPORARY FUNCTION fdb_tb(x DOUBLE) RETURNS DOUBLE RETURN x / 0.000001",
    # F6 display converters (binary 1024 base — replicated quirk)
    "fdb_to_kb": f"CREATE OR REPLACE TEMPORARY FUNCTION fdb_to_kb(x DOUBLE) RETURNS DOUBLE RETURN x * {1024 ** -1!r}",
    "fdb_to_mb": "CREATE OR REPLACE TEMPORARY FUNCTION fdb_to_mb(x DOUBLE) RETURNS DOUBLE RETURN x * 1.0",
    "fdb_to_gb": "CREATE OR REPLACE TEMPORARY FUNCTION fdb_to_gb(x DOUBLE) RETURNS DOUBLE RETURN x * 1024.0",
    "fdb_to_tb": f"CREATE OR REPLACE TEMPORARY FUNCTION fdb_to_tb(x DOUBLE) RETURNS DOUBLE RETURN x * {float(1024 ** 2)!r}",
    # F7 strip trailing slashes/pipes, drive-root friendly
    "fdb_strip_trailing_slashes": r"""
        CREATE OR REPLACE TEMPORARY FUNCTION fdb_strip_trailing_slashes(p STRING)
        RETURNS STRING RETURN regexp_replace(trim(p), '([^:])?[\\\\|/]+$', '$1')
    """,
    # F12 clamp
    "fdb_clamp": "CREATE OR REPLACE TEMPORARY FUNCTION fdb_clamp(x DOUBLE, lo DOUBLE, hi DOUBLE) RETURNS DOUBLE RETURN least(greatest(x, lo), hi)",
}


def register_sql_functions(spark: SparkSession) -> None:
    """Create (or replace) every ``fdb_*`` SQL-body function on the
    session. Idempotent; call before handing SQL strings to users."""
    for ddl in SQL_FUNCTIONS.values():
        spark.sql(ddl)
