"""Scalar path/string/unit library — parity with the reference's
"standard library" of IMMUTABLE SQL functions (SURVEY.md §2.8, F1-F15).

Reference semantics (cited file:line are into /root/reference):
- basepath          FileDbDAL/SQLUtil.py:14-29
- basename          FileDbDAL/SQLUtil.py:31-44
- extension         FileDbDAL/SQLUtil.py:46-61  (dotless name -> whole
                    lowered name; text after LAST dot otherwise)
- path_join         FileDbDAL/SQLUtil.py:64-74 (SQL: always backslash);
                    API/Util.py:132-161 (python: separator sniffing —
                    we implement the smarter python semantics for the
                    driver-side helper and keep a Column version)
- kb/mb/gb/tb       FileDbDAL/SQLUtil.py:78-114  (decimal units, target
                    is the `size`-in-MB storage unit)
- to_kb..to_tb      FileDbDAL/SQLUtil.py:118-154 (binary 1024 units —
                    intentionally a different base; replicated quirk)
- strip_trailing_slashes  FileDbDAL/SQLUtil.py:158-172, API/Util.py:165-168
- sql_path_parse_wildcard_search  FileDbDAL/SQLUtil.py:177-197,
                    API/Util.py:36-48
- path_os / is_nix_path / is_win_path / path_separator  API/Util.py:93-144
- input_parse_bool  API/Util.py:14-31
- sql_sanitize_order_by  API/Util.py:60-90

Everything row-wise is a native Column expression (JVM-side, codegen);
NO Python UDFs here. Driver-side input parsers are plain Python.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "basepath",
    "basename",
    "extension",
    "path_join_col",
    "kb",
    "mb",
    "gb",
    "tb",
    "to_kb",
    "to_mb",
    "to_gb",
    "to_tb",
    "strip_trailing_slashes_col",
    "strip_trailing_slashes",
    "sql_path_parse_wildcard_search",
    "sql_path_parse_exact_search",
    "path_os",
    "is_nix_path",
    "is_win_path",
    "path_separator",
    "path_join",
    "input_parse_bool",
    "sql_sanitize_order_by",
    "clamp",
]

# ---------------------------------------------------------------------------
# Column-expression functions (run JVM-side inside whole-stage codegen)
# ---------------------------------------------------------------------------

# Java regex: char class containing '/' and '\'; lookbehind requires one
# preceding char so "/x" keeps its root slash semantics like the reference.
_BASEPATH_RE = r"(?<=.)[/\\][^/\\]+$"
_BASENAME_RE = r"^.+[/\\]"
_EXTENSION_RE = r"^.+\."
_TRAILING_SLASH_RE = r"([^:])?[\\|/]+$"


def basepath(col: Column | str) -> Column:
    """Parent directory of a path (F1). 'C:\\Windows\\calc.exe' -> 'C:\\Windows';
    bare drive results re-gain a backslash: 'C:\\x' -> 'C:\\'."""
    c = F.col(col) if isinstance(col, str) else col
    stripped = F.regexp_replace(c, _BASEPATH_RE, "")
    return F.when(stripped.endswith(":"), F.concat(stripped, F.lit("\\"))).otherwise(
        stripped
    )


def basename(col: Column | str) -> Column:
    """Last path segment (F2). 'C:\\Windows\\calc.exe' -> 'calc.exe'."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(c, _BASENAME_RE, "")


def extension(col: Column | str) -> Column:
    """Lowercased text after the final dot (F3). Quirk replicated: a name
    with NO dot returns the entire lowered name."""
    c = F.col(col) if isinstance(col, str) else col
    return F.lower(F.regexp_replace(c, _EXTENSION_RE, ""))


def path_join_col(dir_col: Column | str, name_col: Column | str, sep: str = "\\") -> Column:
    """F4 Column form — reference SQL always joins with a backslash."""
    d = F.col(dir_col) if isinstance(dir_col, str) else dir_col
    n = F.col(name_col) if isinstance(name_col, str) else name_col
    return F.concat(d, F.lit(sep), n)


# --- unit converters (F5: decimal, to the MB storage unit of file.size) ---
def kb(c: Column | float) -> Column:
    return (F.lit(c) if not isinstance(c, Column) else c) / 1000.0


def mb(c: Column | float) -> Column:
    return (F.lit(c) if not isinstance(c, Column) else c) / 1.0


def gb(c: Column | float) -> Column:
    return (F.lit(c) if not isinstance(c, Column) else c) / 0.001


def tb(c: Column | float) -> Column:
    return (F.lit(c) if not isinstance(c, Column) else c) / 0.000001


# --- display converters (F6: binary 1024 base — reference quirk) ---
def to_kb(c: Column | float) -> Column:
    return (F.lit(c) if not isinstance(c, Column) else c) * float(1024**-1)


def to_mb(c: Column | float) -> Column:
    return (F.lit(c) if not isinstance(c, Column) else c) * 1.0


def to_gb(c: Column | float) -> Column:
    return (F.lit(c) if not isinstance(c, Column) else c) * 1024.0


def to_tb(c: Column | float) -> Column:
    return (F.lit(c) if not isinstance(c, Column) else c) * float(1024**2)


def strip_trailing_slashes_col(col: Column | str) -> Column:
    """F7 Column form — trim then drop trailing slashes/pipes, preserving
    one char captured before them (drive-root friendly)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(F.trim(c), _TRAILING_SLASH_RE, "$1")


def clamp(c: Column, lo, hi) -> Column:
    """F12: least/greatest clamp."""
    return F.least(F.greatest(c, F.lit(lo)), F.lit(hi))


# ---------------------------------------------------------------------------
# Driver-side input parsers (run once per query, never per-row)
# ---------------------------------------------------------------------------


def strip_trailing_slashes(path: str) -> str:
    """F7 python mirror — API/Util.py:165-168 semantics EXACTLY (trim,
    then one slash-strip pass preserving a captured pre-slash char for
    drive roots). Deliberately NOT a fixpoint: on pathological inputs
    (a path whose trailing whitespace hides behind the slash, '/0 /';
    a doubled drive-root slash) the reference's single application is
    not idempotent, and parity wins — the sanitizer runs once per
    user input, never on its own output."""
    path = path.strip()
    return re.sub(r"([^:])?[\\|/]+$", r"\1", path)


def sql_path_parse_wildcard_search(path: str) -> str:
    """F8: OS wildcards -> SQL LIKE wildcards with escaping
    (API/Util.py:36-48). Output feeds Column.like()."""
    path = path.strip()
    path = path.replace("\\", "\\\\")
    path = path.replace("%", r"\%")
    path = path.replace("_", r"\_")
    path = path.replace("*", "%")
    path = path.replace("?", "_")
    return path


def sql_path_parse_exact_search(path: str) -> str:
    """F9 = strip_trailing_slashes."""
    return strip_trailing_slashes(path)


def path_os(path: str) -> str:
    """F13: classify a path as win/nix ('' if undeterminable; '?' suffix
    for fuzzy guesses). API/Util.py:93-115 semantics."""
    path = path.strip()
    if not path:
        return ""
    if path[0] == "/" and "\\" not in path:
        return "nix"
    if len(path) > 1 and path[0].isalpha() and path[1] == ":" and "/" not in path:
        return "win"
    if "/" in path and "\\" not in path:
        return "nix?"
    if "\\" in path and "/" not in path:
        return "win?"
    return ""


def is_nix_path(path: str, fuzzy_check: bool = False) -> bool:
    os_ = path_os(path)
    return os_ == "nix" or (os_ == "nix?" and fuzzy_check)


def is_win_path(path: str, fuzzy_check: bool = False) -> bool:
    os_ = path_os(path)
    return os_ == "win" or (os_ == "win?" and fuzzy_check)


def path_separator(path: str) -> str:
    if is_win_path(path, fuzzy_check=False):
        return "\\"
    if is_nix_path(path, fuzzy_check=False):
        return "/"
    if is_win_path(path, fuzzy_check=True):
        return "\\"
    return "/"


def path_join(*path_slices: str) -> str:
    """F4 python mirror with separator sniffing (API/Util.py:132-161)."""
    if len(path_slices) == 0:
        return ""
    if len(path_slices) == 1:
        return path_slices[0]
    separator = path_separator("".join(path_slices))
    return separator.join(path_slices)


def input_parse_bool(val) -> bool:
    """F14 (API/Util.py:14-31): defaults to False on anything unknown."""
    try:
        val = str(val).strip()
    except Exception:
        return False
    return val in ("true", "t", "yes", "y", "1")


def sql_sanitize_order_by(sql: str, valid_columns: list[str]) -> list[tuple[str, str]]:
    """T4 sanitizer (API/Util.py:60-90). Returns [(column, direction)]
    pairs instead of SQL text — the Spark engine applies them as
    Column.asc()/desc() so no string SQL is ever built from user input."""
    try:
        sql = str(sql).strip()
    except Exception:
        return []
    out: list[tuple[str, str]] = []
    for raw in sql.split(","):
        if not raw:
            continue
        parts = raw.split()
        if len(parts) > 2 or not parts:
            continue
        direction = "asc"
        if len(parts) == 2:
            if parts[1].lower() not in ("asc", "desc"):
                continue
            direction = parts[1].lower()
        if parts[0] not in valid_columns:
            continue
        out.append((parts[0], direction))
    return out
