"""file_db domain engine: the catalog data model, filesystem sources,
views, search API, merge pipeline and scheduler re-expressed Spark-first
(SURVEY.md §1-§3).

Modules:
- schemas    StructTypes for every catalog tier (§1.1)
- fixtures   deterministic domain-fixture derivation from testdata
             (FIXTURES.md §A) — shared by the DuckDB oracles
- views      vw_ll / vw_file_detail / dir_detail / vwf_* (§1.1 derived)
- search     search_file/dir/full_path + duplicate search (§2.3 J5-J7)
- scan       S1 filesystem scan source (mapPartitions + os.scandir)
- hashing    S6 MD5+SHA1 chunked hashing source (mapInPandas)
- merge      M1-M4 staged upsert / change detection / archive (§2.9)
- scheduler  T1/T2 claims + O7 adaptive re-crawl frequency (§4)
"""

from . import fixtures, schemas, search, views  # noqa: F401
