r"""Oracle-backed registry queries for the file_db catalog domain:
views (vw_ll / vw_file_detail / dir_detail / vwf_*) and the search API
(wildcard, full-path probe, suffix, flagship duplicate search), all over
the deterministic domain fixtures (filedb/fixtures.py = FIXTURES.md §A).

Each oracle prepends the shared fixture CTEs so DuckDB constructs the
identical catalog, then mirrors the view/search semantics in ANSI SQL.
DuckDB's RE2 lacks lookbehind, so basepath is emulated with a capture
group — identical output on all fixture paths (see `_BP`).

Sizes surface as DOUBLE in every projection (exact here; avoids
decimal-dtype mismatches between the two pandas bridges).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..filedb import fixtures, search, views
from ..localframe import local_df

QUERIES: dict = {}
ORACLES: dict[str, str] = {}


def _q(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def _catalog(spark: SparkSession, sf_dir: str):
    d = fixtures.fixture_directory(spark, sf_dir)
    f = fixtures.fixture_file(spark, sf_dir)
    h = fixtures.fixture_hash(spark, sf_dir)
    fc = fixtures.fixture_file_category(spark)
    return d, f, h, fc


def _listing(spark: SparkSession, sf_dir: str) -> DataFrame:
    d, f, h, _ = _catalog(spark, sf_dir)
    return views.vw_ll(d, f, h)


# DuckDB basepath emulation (no lookbehind in RE2): capture the char
# before the final separator; then the drive-root recovery.
_BP = (
    "CASE WHEN regexp_replace({p}, '(.)[/\\\\][^/\\\\]+$', '\\1') LIKE '%:' "
    "THEN regexp_replace({p}, '(.)[/\\\\][^/\\\\]+$', '\\1') || '\\' "
    "ELSE regexp_replace({p}, '(.)[/\\\\][^/\\\\]+$', '\\1') END"
)

# vw_ll as a DuckDB CTE over the fixture CTEs (mirrors views.vw_ll).
_VW_LL_CTE = f"""
vw_ll AS (
  SELECT 'file' AS type, d.dir_path || '\\' || f.name AS full_path,
         f.id AS file_id, f.name, f.dir_id, f.size, f.ctime, f.mtime,
         f.atime, h.md5_hash, h.sha1_hash, d.dir_path
  FROM fx_file f
  JOIN fx_directory d ON f.dir_id = d.id
  LEFT JOIN fx_hash h ON h.file_id = f.id
  UNION ALL
  SELECT 'dir' AS type, c.dir_path AS full_path,
         CAST(NULL AS BIGINT) AS file_id,
         regexp_replace(c.dir_path, '^.+[/\\\\]', '') AS name,
         p.id AS dir_id, CAST(NULL AS DECIMAL(18,6)) AS size,
         c.ctime, c.mtime, CAST(NULL AS TIMESTAMP) AS atime,
         CAST(NULL AS VARCHAR) AS md5_hash, CAST(NULL AS VARCHAR) AS sha1_hash,
         {_BP.format(p="c.dir_path")} AS dir_path
  FROM fx_directory c
  JOIN fx_directory p ON {_BP.format(p="c.dir_path")} = p.dir_path
)
"""

_LL_COLS = (
    "type, full_path, file_id, name, dir_id, CAST(size AS DOUBLE) AS size, "
    "ctime, mtime, atime, md5_hash, sha1_hash, dir_path"
)


def _ll_cols(df: DataFrame) -> DataFrame:
    return df.withColumn("size", F.col("size").cast("double"))


# ---------------------------------------------------------------------------
# c1-c5: the derived views
# ---------------------------------------------------------------------------
@_q(
    "c1_vw_ll",
    f"WITH {fixtures.FIXTURE_CTES}, {_VW_LL_CTE} SELECT {_LL_COLS} FROM vw_ll",
)
def c1_vw_ll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U1+J1+J2: the union listing relation (SQLUtil.py:223-248)."""
    return _ll_cols(_listing(spark, sf_dir))


@_q(
    "c2_vw_file_detail",
    f"""
    WITH {fixtures.FIXTURE_CTES}
    SELECT f.id AS file_id, f.name, d.dir_path || '\\' || f.name AS full_path,
           f.dir_id, d.dir_path, CAST(f.size AS DOUBLE) AS size,
           f.ctime, f.mtime, f.atime, h.md5_hash, h.sha1_hash, fc.category
    FROM fx_file f
    JOIN fx_directory d ON f.dir_id = d.id
    LEFT JOIN fx_hash h ON h.file_id = f.id
    LEFT JOIN fx_file_category fc
      ON fc.extension = lower(regexp_replace(f.name, '^.+\\.', ''))
    """,
)
def c2_vw_file_detail(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1-J3: file detail with category via the derived extension key
    (SQLUtil.py:252-266; dotless names categorize as NULL — F3 quirk)."""
    d, f, h, fc = _catalog(spark, sf_dir)
    return views.vw_file_detail(d, f, h, fc).withColumn(
        "size", F.col("size").cast("double")
    )


@_q(
    "c3_dir_detail",
    f"""
    WITH {fixtures.FIXTURE_CTES},
    sub AS (
      SELECT {_BP.format(p="dir_path")} AS parent_path, COUNT(*) AS subdir_count
      FROM fx_directory GROUP BY 1
    ),
    fagg AS (
      SELECT dir_id, COUNT(*) AS file_count,
             SUM(COALESCE(size, 0)) AS total_size,
             MIN(ctime) AS min_file_ctime, MAX(ctime) AS max_file_ctime,
             MIN(mtime) AS min_file_mtime, MAX(mtime) AS max_file_mtime
      FROM fx_file GROUP BY dir_id
    )
    SELECT d.id AS dir_id, d.dir_path,
           CAST(COALESCE(CASE WHEN {_BP.format(p="d.dir_path")} = d.dir_path
                     THEN s.subdir_count - 1 ELSE s.subdir_count END, 0) AS BIGINT)
             AS subdir_count,
           CAST(COALESCE(f.file_count, 0) AS BIGINT) AS file_count,
           CAST(COALESCE(f.total_size, 0) AS DOUBLE) AS total_size,
           f.min_file_ctime, f.max_file_ctime, f.min_file_mtime, f.max_file_mtime
    FROM fx_directory d
    LEFT JOIN sub s ON d.dir_path = s.parent_path
    LEFT JOIN fagg f ON d.id = f.dir_id
    """,
)
def c3_dir_detail(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1: per-directory rollup (SQLUtil.py:269-286)."""
    d, f, _, _ = _catalog(spark, sf_dir)
    return views.dir_detail(d, f).withColumn(
        "total_size", F.col("total_size").cast("double")
    )


@_q(
    "c4_dir_contents",
    f"""
    WITH {fixtures.FIXTURE_CTES}, {_VW_LL_CTE}
    SELECT {_LL_COLS} FROM vw_ll WHERE dir_id IN (1, 2, 3)
    """,
)
def c4_dir_contents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """vwf_dir_contents (SQLUtil.py:295-339): parameterized listing."""
    d, f, h, _ = _catalog(spark, sf_dir)
    return _ll_cols(views.vwf_dir_contents(d, f, h, [1, 2, 3]))


@_q(
    "c5_directory_activity",
    f"""
    WITH {fixtures.FIXTURE_CTES}
    SELECT dir_id, MIN(ctime) AS min_ctime, MAX(ctime) AS max_ctime,
           MIN(mtime) AS min_mtime, MAX(mtime) AS max_mtime
    FROM fx_file WHERE dir_id IN (1,2,3,4,5,6,7,8,9,10)
    GROUP BY dir_id
    """,
)
def c5_directory_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """vwf_directory_activity (SQLUtil.py:360-383)."""
    _, f, _, _ = _catalog(spark, sf_dir)
    return views.vwf_directory_activity(f, list(range(1, 11)))


# ---------------------------------------------------------------------------
# c6-c12: the search API
# ---------------------------------------------------------------------------
@_q(
    "c6_search_file",
    f"""
    WITH {fixtures.FIXTURE_CTES}, {_VW_LL_CTE}
    SELECT {_LL_COLS} FROM vw_ll
    WHERE type = 'file' AND name LIKE 'doc\\_1%' ESCAPE '\\'
    """,
)
def c6_search_file(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P3+F8: wildcard file search, 'doc_1*' -> LIKE with escaped '_'
    (Search.py:157-186)."""
    return _ll_cols(search.search_file(_listing(spark, sf_dir), "doc_1*"))


@_q(
    "c7_search_full_path",
    f"""
    WITH {fixtures.FIXTURE_CTES}, {_VW_LL_CTE},
    probes AS (
      SELECT probe_path, {_BP.format(p="probe_path")} AS p_dir,
             regexp_replace(probe_path, '^.+[/\\\\]', '') AS p_name
      FROM (VALUES ('/corpus/src2\\doc_2.txt'),
                   ('C:\\corpus\\src9\\same_name.txt'),
                   ('/corpus/src4'),
                   ('/nope/missing.txt')) AS t(probe_path)
    )
    SELECT {_LL_COLS}, probe_path FROM vw_ll
    JOIN probes ON vw_ll.dir_path = probes.p_dir AND vw_ll.name = probes.p_name
    """,
)
def c7_search_full_path(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J7 array-probe join (Search.py:125-154). Probe paths use the
    view's backslash-join quirk; '/corpus/src1' resolves as a dir row."""
    out = search.search_full_path(
        spark,
        _listing(spark, sf_dir),
        [
            "/corpus/src2\\doc_2.txt",
            "C:\\corpus\\src9\\same_name.txt",
            "/corpus/src4",
            "/nope/missing.txt",
        ],
    )
    return _ll_cols(out)


@_q(
    "c8_duplicate_search",
    f"""
    WITH {fixtures.FIXTURE_CTES}, {_VW_LL_CTE},
    files AS (SELECT * FROM vw_ll WHERE type = 'file'),
    needles AS (
      SELECT file_id AS n_file_id, name AS n_name, size AS n_size,
             md5_hash AS n_md5, sha1_hash AS n_sha1
      FROM files WHERE file_id IN (12, 6, 4)
    ),
    matched AS (
      SELECT n.n_file_id, f.* FROM files f JOIN needles n
        ON f.sha1_hash = n.n_sha1 AND f.size = n.n_size
      UNION
      SELECT n.n_file_id, f.* FROM files f JOIN needles n
        ON n.n_sha1 IS NULL AND f.md5_hash = n.n_md5 AND f.size = n.n_size
      UNION
      SELECT n.n_file_id, f.* FROM files f JOIN needles n ON f.name = n.n_name
    )
    SELECT n_file_id AS needle_file_id, type, full_path, file_id, name, dir_id,
           CAST(size AS DOUBLE) AS size, md5_hash, sha1_hash, dir_path
    FROM matched WHERE file_id <> n_file_id
    """,
)
def c8_duplicate_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The flagship duplicate search (readme.md:26-36), id overload,
    three needles: 12 (sha1+size triple -> 2 matches), 6 (sha1 NULL ->
    MD5-fallback pair -> 1 match), 4 (same sha1, different size -> no
    match). J6 decomposed into unioned equi-joins."""
    out = search.search_duplicate_files_by_id(_listing(spark, sf_dir), [12, 6, 4])
    return out.withColumn("size", F.col("size").cast("double")).drop(
        "ctime", "mtime", "atime"
    )


@_q(
    "c9_duplicate_groups",
    f"""
    WITH {fixtures.FIXTURE_CTES}, {_VW_LL_CTE}
    SELECT full_path, file_id, name, dir_id, CAST(size AS DOUBLE) AS size,
           sha1_hash, duplicate_count
    FROM (
      SELECT *, COUNT(*) OVER (PARTITION BY sha1_hash, size) AS duplicate_count
      FROM vw_ll
      WHERE type = 'file' AND sha1_hash IS NOT NULL AND size IS NOT NULL
    ) WHERE duplicate_count >= 2
    """,
)
def c9_duplicate_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J5/A2 as a window count (SURVEY §2.5) — the whole-catalog
    duplicate report."""
    out = search.duplicate_groups(_listing(spark, sf_dir), min_count=2)
    return out.withColumn("size", F.col("size").cast("double")).withColumn(
        "duplicate_count", F.col("duplicate_count").cast("bigint")
    )


@_q(
    "c10_path_probes",
    f"""
    WITH {fixtures.FIXTURE_CTES},
    probes AS (SELECT * FROM (VALUES ('/corpus'), ('C:\\'), ('/corpus/src5'),
                                     ('/nope')) AS t(probe_path))
    SELECT p.probe_path, CAST(COUNT(d.id) AS BIGINT) AS n_matches
    FROM probes p LEFT JOIN fx_directory d ON d.dir_path = p.probe_path
    GROUP BY p.probe_path
    """,
)
def c10_path_probes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1 exact dir-path probes as a set query (Directory.py:181-193)."""
    d, _, _, _ = _catalog(spark, sf_dir)
    probes = local_df(spark, 
        [("/corpus",), ("C:\\",), ("/corpus/src5",), ("/nope",)],
        "probe_path string",
    )
    return (
        probes.join(F.broadcast(d), d.dir_path == probes.probe_path, "left")
        .groupBy("probe_path")
        .agg(F.count(d.id).alias("n_matches"))
    )


@_q(
    "c11_search_suffix",
    f"""
    WITH {fixtures.FIXTURE_CTES}, {_VW_LL_CTE}
    SELECT {_LL_COLS} FROM vw_ll
    WHERE type = 'file' AND name LIKE '%.t\\_t' ESCAPE '\\'
    """,
)
def c11_search_suffix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F10 suffix search (reverse-index semantics, File.py:215,224)."""
    return _ll_cols(search.search_file_suffix(_listing(spark, sf_dir), ".t_t"))


@_q(
    "c12_search_dir",
    f"""
    WITH {fixtures.FIXTURE_CTES}, {_VW_LL_CTE}
    SELECT {_LL_COLS} FROM vw_ll
    WHERE type = 'dir' AND name LIKE '%1%'
    """,
)
def c12_search_dir(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wildcard directory search (Search.py:189-218)."""
    return _ll_cols(search.search_dir(_listing(spark, sf_dir), "*1*"))


# ---------------------------------------------------------------------------
# cs1: packed name-search carrier (c6 + c11 + c12 — identical LL schema)
# frees graded slots for the J6 directory-duplicate queries below; the
# member originals stay registered above and in ALL_QUERIES.
# ---------------------------------------------------------------------------
@_q(
    "cs1_name_search_suite",
    f"""
    WITH {fixtures.FIXTURE_CTES}, {_VW_LL_CTE}
    SELECT 'c6' AS probe, {_LL_COLS} FROM vw_ll
    WHERE type = 'file' AND name LIKE 'doc\\_1%' ESCAPE '\\'
    UNION ALL
    SELECT 'c11', {_LL_COLS} FROM vw_ll
    WHERE type = 'file' AND name LIKE '%.t\\_t' ESCAPE '\\'
    UNION ALL
    SELECT 'c12', {_LL_COLS} FROM vw_ll
    WHERE type = 'dir' AND name LIKE '%1%'
    """,
)
def cs1_name_search_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P3/F8 + F10 + dir wildcard in one graded row: each member runs
    the SAME search-function implementation unchanged (suites.py
    convention — member tag first so a mismatch pinpoints the
    operator)."""
    ll = _listing(spark, sf_dir)
    parts = [
        _ll_cols(search.search_file(ll, "doc_1*")).select(
            F.lit("c6").alias("probe"), "*"
        ),
        _ll_cols(search.search_file_suffix(ll, ".t_t")).select(
            F.lit("c11").alias("probe"), "*"
        ),
        _ll_cols(search.search_dir(ll, "*1*")).select(
            F.lit("c12").alias("probe"), "*"
        ),
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


# ---------------------------------------------------------------------------
# cs3/cs4: packed parameterized-lookup carriers (round-7 window
# rebalance: the freed slots went to the split streaming carriers and
# the MERGE INTO entry). cs3 packs the two vw_ll-shaped parameterized
# reads (c4 dir-contents + c7 full-path probes); cs4 the two small
# probe aggregates (c5 directory activity + c10 exact-path probes).
# Member originals stay registered and individually checked.
# ---------------------------------------------------------------------------
@_q(
    "cs3_param_listing_suite",
    f"""
    WITH {fixtures.FIXTURE_CTES}, {_VW_LL_CTE},
    probes AS (
      SELECT probe_path, {_BP.format(p="probe_path")} AS p_dir,
             regexp_replace(probe_path, '^.+[/\\\\]', '') AS p_name
      FROM (VALUES ('/corpus/src2\\doc_2.txt'),
                   ('C:\\corpus\\src9\\same_name.txt'),
                   ('/corpus/src4'),
                   ('/nope/missing.txt')) AS t(probe_path)
    )
    SELECT 'c4' AS probe, {_LL_COLS}, CAST(NULL AS VARCHAR) AS probe_path
    FROM vw_ll WHERE dir_id IN (1, 2, 3)
    UNION ALL
    SELECT 'c7', {_LL_COLS}, probe_path FROM vw_ll
    JOIN probes ON vw_ll.dir_path = probes.p_dir AND vw_ll.name = probes.p_name
    """,
)
def cs3_param_listing_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """vwf_dir_contents (parameterized listing) + J7 array-probe
    full-path lookup in one graded row — both members run the SAME
    view/search implementations unchanged (c4/c7)."""
    d, f, h, _ = _catalog(spark, sf_dir)
    ll = _listing(spark, sf_dir)
    c4 = (
        _ll_cols(views.vwf_dir_contents(d, f, h, [1, 2, 3]))
        .select(F.lit("c4").alias("probe"), "*")
        .withColumn("probe_path", F.lit(None).cast("string"))
    )
    c7 = _ll_cols(
        search.search_full_path(
            spark,
            ll,
            [
                "/corpus/src2\\doc_2.txt",
                "C:\\corpus\\src9\\same_name.txt",
                "/corpus/src4",
                "/nope/missing.txt",
            ],
        )
    ).select(F.lit("c7").alias("probe"), "*")
    return c4.unionByName(c7)


@_q(
    "cs4_probe_agg_suite",
    f"""
    WITH {fixtures.FIXTURE_CTES},
    probes AS (SELECT * FROM (VALUES ('/corpus'), ('C:\\'), ('/corpus/src5'),
                                     ('/nope')) AS t(probe_path))
    SELECT 'c5' AS probe, CAST(dir_id AS VARCHAR) AS key_s,
           CAST(NULL AS BIGINT) AS n,
           MIN(ctime) AS t1, MAX(ctime) AS t2, MIN(mtime) AS t3,
           MAX(mtime) AS t4
    FROM fx_file WHERE dir_id IN (1,2,3,4,5,6,7,8,9,10)
    GROUP BY dir_id
    UNION ALL
    SELECT 'c10', p.probe_path, CAST(COUNT(d.id) AS BIGINT),
           CAST(NULL AS TIMESTAMP), CAST(NULL AS TIMESTAMP),
           CAST(NULL AS TIMESTAMP), CAST(NULL AS TIMESTAMP)
    FROM probes p LEFT JOIN fx_directory d ON d.dir_path = p.probe_path
    GROUP BY p.probe_path
    """,
)
def cs4_probe_agg_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """vwf_directory_activity (c5) + P1 exact-path probe counts (c10)
    in one graded row; both members run their original
    implementations unchanged."""
    c5 = QUERIES["c5_directory_activity"](spark, sf_dir).select(
        F.lit("c5").alias("probe"),
        F.col("dir_id").cast("string").alias("key_s"),
        F.lit(None).cast("bigint").alias("n"),
        F.col("min_ctime").alias("t1"),
        F.col("max_ctime").alias("t2"),
        F.col("min_mtime").alias("t3"),
        F.col("max_mtime").alias("t4"),
    )
    c10 = QUERIES["c10_path_probes"](spark, sf_dir).select(
        F.lit("c10").alias("probe"),
        F.col("probe_path").alias("key_s"),
        F.col("n_matches").alias("n"),
        *[F.lit(None).cast("timestamp").alias(t) for t in ("t1", "t2", "t3", "t4")],
    )
    return c5.unionByName(c10)


# ---------------------------------------------------------------------------
# c13/c14: the J6 DIRECTORY duplicate search (reference Search.py:298-345)
# ---------------------------------------------------------------------------
# Shared oracle text for the sha1-preferred / md5-fallback / size match,
# mirroring the documented-intent semantics used by c8 (needle-keyed
# fallback: try md5 only when the needle's sha1 is NULL).
_DUP_DIR_PRE = """
    files AS (SELECT * FROM vw_ll WHERE type = 'file'),
    needle AS (
      SELECT file_id AS n_file_id, name AS n_name, size AS n_size,
             md5_hash AS n_md5, sha1_hash AS n_sha1
      FROM files WHERE dir_path = '/corpus/src2'
    )"""

_DUP_DIR_BODY = f"""
    SELECT {_LL_COLS} FROM files WHERE dir_path = '/corpus/src2'
    UNION
    SELECT {_LL_COLS} FROM files f
    WHERE EXISTS (
      SELECT 1 FROM needle n
      WHERE n.n_sha1 IS NOT NULL AND f.sha1_hash = n.n_sha1
        AND f.size = n.n_size
    )
    UNION
    SELECT {_LL_COLS} FROM files f
    WHERE EXISTS (
      SELECT 1 FROM needle n
      WHERE n.n_sha1 IS NULL AND n.n_md5 IS NOT NULL
        AND f.md5_hash = n.n_md5 AND f.size = n.n_size
    )"""

_DUP_DIR_ORACLE = f"""
    WITH {fixtures.FIXTURE_CTES}, {_VW_LL_CTE}, {_DUP_DIR_PRE}
    {_DUP_DIR_BODY}
    """


@_q("c13_duplicate_dir", _DUP_DIR_ORACLE)
def c13_duplicate_dir(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J6 directory form (Search.py:298-345): needle = every file in
    '/corpus/src2'; result = the needle's own rows (the `f.id = n.id`
    clause) plus every catalog file matching a needle on
    sha1-preferred/md5-fallback hash AND size. Decomposed as unioned
    broadcast equi-joins; see search.search_duplicate_dir."""
    out = search.search_duplicate_dir(
        _listing(spark, sf_dir), "/corpus/src2", hash_match_files=True
    )
    return _ll_cols(out)


#: per-dir multiset fingerprint CTE — content keys md5-hashed BEFORE
#: the sort+join so raw names containing '|' / ':' cannot collide two
#: different multisets into one digest input (ADVICE r4)
_C14_PRE = """
    per_dir AS (
      SELECT dir_id, dir_path,
             CAST(COUNT(*) AS BIGINT) AS file_count,
             md5(string_agg(ck, '|' ORDER BY ck)) AS content_fingerprint
      FROM (
        SELECT dir_id, dir_path,
               md5(COALESCE(sha1_hash, 'm:' || md5_hash, 'n:' || name)
                 || ':' || COALESCE(CAST(size AS VARCHAR), '~')) AS ck
        FROM files
      ) GROUP BY dir_id, dir_path
    )"""

_C14_BODY = """
    SELECT dir_id, dir_path, file_count, content_fingerprint,
           CAST(COUNT(*) OVER (PARTITION BY content_fingerprint) AS BIGINT)
             AS n_dirs_sharing
    FROM per_dir"""


@_q(
    "c14_duplicate_dir_contents",
    f"""
    WITH {fixtures.FIXTURE_CTES}, {_VW_LL_CTE},
    files AS (SELECT * FROM vw_ll WHERE type = 'file'),
    {_C14_PRE}
    {_C14_BODY}
    """,
)
def c14_duplicate_dir_contents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's TODO'd identical-dir-contents match
    (Search.py:305-307) in its scale-correct form: per-dir multiset
    fingerprint of (content key, size) + a count of dirs sharing each
    fingerprint — one groupBy + one window, no dir×dir join. See
    search.duplicate_dir_contents."""
    return search.duplicate_dir_contents(_listing(spark, sf_dir))


_C15_PRE = """
    detail AS (
      SELECT f.name, d.dir_path || '\\' || f.name AS full_path, d.dir_path,
             CAST(f.size AS DOUBLE) AS size, f.ctime, f.mtime, h.sha1_hash
      FROM fx_file f
      JOIN fx_directory d ON f.dir_id = d.id
      LEFT JOIN fx_hash h ON h.file_id = f.id
    ),
    filtered AS (
      SELECT * FROM detail
      WHERE dir_path LIKE '/corpus%'
        AND size > 0.010
        AND sha1_hash IS NOT NULL
        AND lower(regexp_replace(name, '^.+\\.', '')) IN ('txt', 't_t')
    )"""

_C15_BODY = """
    SELECT sha1_hash, size, duplicate_count, full_path, name, ctime, mtime
    FROM (
      SELECT *, CAST(COUNT(*) OVER (PARTITION BY sha1_hash, size) AS BIGINT)
               AS duplicate_count
      FROM filtered
    ) WHERE duplicate_count >= 2
    ORDER BY sha1_hash, full_path
    LIMIT 1000"""


@_q(
    "c15_duplicate_media",
    f"""
    WITH {fixtures.FIXTURE_CTES},
    {_C15_PRE}
    {_C15_BODY}
    """,
)
def c15_duplicate_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The DuplicateImageBrowser plugin's query (the reference's only
    GUI plugin) through search.duplicate_media_groups: duplicate
    (sha1, size) groups under a dir prefix with a size floor and an
    extension filter. The fixture corpus has no image names, so the
    graded entry passes the fixture's extensions — the plugin's CLI
    front-end (cli.do_dup_images) passes IMAGE_EXTENSIONS; the query
    SHAPE is what the oracle certifies."""
    d, f, h, fc = _catalog(spark, sf_dir)
    detail = views.vw_file_detail(d, f, h, fc).withColumn(
        "size", F.col("size").cast("double")
    )
    return search.duplicate_media_groups(
        detail,
        dir_like="/corpus%",
        min_size_mb=0.010,
        extensions=("txt", "t_t"),
        limit=1000,
    )


# ---------------------------------------------------------------------------
# cs2: packed duplicate-query carrier (c13 + c14 + c15) — one graded
# row certifies the J6 dir form, the identical-contents fingerprint,
# and the DuplicateImageBrowser plugin query; frees a graded slot for
# x30 (the collapse-first dedup graph). Member originals stay
# registered above with their own full-schema oracles. Normalized to
# the rq3 (probe, k1, k2, k3, s1, v1) convention; string parts are
# COALESCEd on BOTH sides (concat_ws skips nulls, DuckDB || propagates
# them).
# ---------------------------------------------------------------------------
@_q(
    "cs2_duplicate_suite",
    f"""
    WITH {fixtures.FIXTURE_CTES}, {_VW_LL_CTE}, {_DUP_DIR_PRE},
    {_C14_PRE},
    {_C15_PRE}
    SELECT 'c13' AS probe, CAST(file_id AS BIGINT) AS k1,
           CAST(dir_id AS BIGINT) AS k2, CAST(NULL AS BIGINT) AS k3,
           full_path || '#' || COALESCE(sha1_hash, '-')
             || '#' || COALESCE(md5_hash, '-') AS s1,
           size AS v1
    FROM ({_DUP_DIR_BODY}) c13q
    UNION ALL
    SELECT 'c14', CAST(dir_id AS BIGINT), file_count, n_dirs_sharing,
           dir_path || '#' || content_fingerprint, CAST(NULL AS DOUBLE)
    FROM ({_C14_BODY}) c14q
    UNION ALL
    SELECT 'c15', CAST(NULL AS BIGINT), duplicate_count,
           CAST(NULL AS BIGINT),
           sha1_hash || '#' || full_path || '#' || name, size
    FROM ({_C15_BODY}) c15q
    """,
)
def cs2_duplicate_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """c13 (J6 dir form) + c14 (identical-contents fingerprint) + c15
    (plugin dup-media groups) in one graded row; each member runs the
    SAME implementation function unchanged (member tag first so a
    mismatch pinpoints the operator)."""
    ll = _listing(spark, sf_dir)
    d, f, h, fc = _catalog(spark, sf_dir)
    bn = F.lit(None).cast("bigint")
    c13 = _ll_cols(
        search.search_duplicate_dir(ll, "/corpus/src2", hash_match_files=True)
    ).select(
        F.lit("c13").alias("probe"),
        F.col("file_id").cast("bigint").alias("k1"),
        F.col("dir_id").cast("bigint").alias("k2"),
        bn.alias("k3"),
        F.concat_ws(
            "#",
            F.col("full_path"),
            F.coalesce(F.col("sha1_hash"), F.lit("-")),
            F.coalesce(F.col("md5_hash"), F.lit("-")),
        ).alias("s1"),
        F.col("size").alias("v1"),
    )
    c14 = search.duplicate_dir_contents(ll).select(
        F.lit("c14").alias("probe"),
        F.col("dir_id").cast("bigint").alias("k1"),
        F.col("file_count").alias("k2"),
        F.col("n_dirs_sharing").alias("k3"),
        F.concat_ws("#", "dir_path", "content_fingerprint").alias("s1"),
        F.lit(None).cast("double").alias("v1"),
    )
    detail = views.vw_file_detail(d, f, h, fc).withColumn(
        "size", F.col("size").cast("double")
    )
    c15 = search.duplicate_media_groups(
        detail,
        dir_like="/corpus%",
        min_size_mb=0.010,
        extensions=("txt", "t_t"),
        limit=1000,
    ).select(
        F.lit("c15").alias("probe"),
        bn.alias("k1"),
        F.col("duplicate_count").alias("k2"),
        bn.alias("k3"),
        F.concat_ws("#", "sha1_hash", "full_path", "name").alias("s1"),
        F.col("size").alias("v1"),
    )
    return c13.unionByName(c14).unionByName(c15)
