from . import dedup, events, multimodal, relational, similarity, textops  # noqa: F401

#: merged {name: (spark, sf_dir) -> DataFrame} across all operator modules
QUERIES = {}
#: merged {name: duckdb-SQL} — omit a key for non-SQL-expressible ops
ORACLES = {}
for _m in (relational, events, textops, dedup, similarity, multimodal):
    QUERIES.update(_m.QUERIES)
    ORACLES.update(_m.ORACLES)
