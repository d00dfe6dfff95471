from . import (  # noqa: F401
    dedup,
    events,
    filedb_catalog,
    multimodal,
    relational,
    similarity,
    streaming_queries,
    textops,
)

#: merged {name: (spark, sf_dir) -> DataFrame} across all operator modules
QUERIES = {}
#: merged {name: duckdb-SQL} — omit a key for non-SQL-expressible ops
ORACLES = {}
for _m in (
    relational,
    events,
    textops,
    dedup,
    similarity,
    multimodal,
    filedb_catalog,
    streaming_queries,
):
    QUERIES.update(_m.QUERIES)
    ORACLES.update(_m.ORACLES)
