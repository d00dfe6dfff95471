"""file_db_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of the reference `robtoyota/file_db`
(a filesystem-metadata catalog engine built on Postgres), re-expressed
Spark-first, plus large-scale training-data-pipeline operators
(dedup, similarity search, text analysis, multimodal plumbing).

Layout
------
- ``session``    — SparkSession builder tuned for scale (AQE, UTC, Arrow).
- ``catalog``    — testdata table loading + view registration.
- ``functions``  — scalar library (path functions F1-F15, text, vectors).
- ``operators``  — relational query inventory (SURVEY.md §2), dedup,
                   similarity, text analysis, event analytics, and the
                   oracle-backed catalog-domain queries.
- ``filedb``     — the file_db domain engine: schemas, fixtures, views,
                   search API, filesystem scan (S1), content hashing
                   (S6), merge pipeline (M1-M8), scheduler, copy (S7),
                   shell (S8).
- ``streaming``  — Structured Streaming variants of the event analytics
                   and the continuous crawl driver.
"""

__version__ = "0.1.0"
