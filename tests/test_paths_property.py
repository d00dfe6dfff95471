"""Generative property tests (hypothesis) for the path scalar library:
invariants that must hold for ANY path the reference's regexes accept,
across both separator families."""

from __future__ import annotations

import re

from hypothesis import assume, given, settings
from hypothesis import strategies as st

from file_db_spark.functions import paths as P

_SEG = st.text(
    alphabet=st.characters(
        whitelist_categories=("Lu", "Ll", "Nd"), whitelist_characters="._- %?*"
    ),
    min_size=1,
    max_size=12,
).filter(lambda s: s.strip() and not s.endswith(":"))


@st.composite
def nix_paths(draw):
    segs = draw(st.lists(_SEG, min_size=1, max_size=5))
    return "/" + "/".join(segs)


@st.composite
def win_paths(draw):
    drive = draw(st.sampled_from("CDEF")) + ":"
    segs = draw(st.lists(_SEG, min_size=1, max_size=5))
    return drive + "\\" + "\\".join(segs)


def _py_basepath(p: str) -> str:
    """Reference regex (SQLUtil.py:14-29) re-expressed in python re —
    the independent model the Column implementation must match."""
    stripped = re.sub(r"(?<=.)[/\\][^/\\]+$", "", p)
    return stripped + "\\" if stripped.endswith(":") else stripped


def _py_basename(p: str) -> str:
    return re.sub(r"^.+[/\\]", "", p)


@settings(max_examples=60, deadline=None)
@given(st.one_of(nix_paths(), win_paths()))
def test_basepath_matches_reference_model(spark, path):
    got = (
        spark.createDataFrame([(path,)], "p string")
        .select(P.basepath("p").alias("v"))
        .collect()[0]["v"]
    )
    assert got == _py_basepath(path)


@settings(max_examples=60, deadline=None)
@given(st.one_of(nix_paths(), win_paths()))
def test_basename_basepath_partition_path(spark, path):
    """basepath + separator + basename reassembles the original path
    whenever the path has a splittable separator."""
    row = (
        spark.createDataFrame([(path,)], "p string")
        .select(P.basepath("p").alias("bp"), P.basename("p").alias("bn"))
        .collect()[0]
    )
    bp, bn = row["bp"], row["bn"]
    assert bn == _py_basename(path)
    if bp != path and not bp.endswith(("\\", "/")):
        assert path in (bp + "/" + bn, bp + "\\" + bn)


@settings(max_examples=100, deadline=None)
@given(st.text(min_size=0, max_size=24))
def test_wildcard_rewrite_escapes_all_like_specials(pattern):
    """After the F8 rewrite, every % or _ in the output is either an
    escaped literal or came from a * / ? wildcard."""
    out = P.sql_path_parse_wildcard_search(pattern)
    i = 0
    unescaped = []
    while i < len(out):
        if out[i] == "\\" and i + 1 < len(out):
            i += 2
            continue
        if out[i] in "%_":
            unescaped.append(out[i])
        i += 1
    # unescaped wildcards only arise from user * / ?
    assert len([c for c in unescaped if c == "%"]) == pattern.count("*")
    assert len([c for c in unescaped if c == "_"]) == pattern.count("?")


@settings(max_examples=60, deadline=None)
@given(st.one_of(nix_paths(), win_paths()), st.integers(0, 3))
def test_strip_trailing_slashes_idempotent(path, n):
    # the sanitizer mirrors the reference's SINGLE trim+strip pass
    # (API/Util.py:165-168), which is deliberately not idempotent when
    # trailing whitespace hides behind the slash ('/0 /' -> '/0 ' ->
    # '/0') or on a bare doubled drive root — exclude exactly those
    # reference-faithful pathologies from the property
    assume(not path[-1].isspace())
    assume(not path.rstrip("\\/").endswith(":"))
    decorated = path + ("/" if path.startswith("/") else "\\") * n
    once = P.strip_trailing_slashes(decorated)
    assert P.strip_trailing_slashes(once) == once
    assert not once.endswith(("/", "\\")) or once.endswith(":\\") is False
