"""S8 interactive shell (SURVEY.md §2.1; reference CLI/__init__.py:
56-226): a thin REPL over the engine API. Command surface parity:

    search <pattern>        wildcard file search (P3/F8)
    search_dir <pattern>    wildcard directory search
    search_dup <path>       flagship duplicate search (readme.md:26-36)
    dup_images [pattern]    duplicate image groups (the
                            DuplicateImageBrowser plugin's query)
    scrape_dir <path>       crawl a directory now (S1 + merges)
    hash_file <path>        hash one file driver-side (S6)
    cd <path> / pwd         shell state
    ls                      listing of the current directory's rows
    schedule                directory_control view (T4-ordered)
    exit

Display is capped at 50 rows (T5, CLI/__init__.py:150-152). The REPL
loop uses plain input(); the engine calls are identical under any
front-end (the reference's prompt_toolkit dependency is cosmetic)."""

from __future__ import annotations

from pyspark.sql import DataFrame

from ..functions.paths import path_join, strip_trailing_slashes
from . import search as search_api
from .engine import Engine

__all__ = ["FileDbShell", "DISPLAY_ROW_CAP"]

#: T5 display cap (CLI/__init__.py:150-152)
DISPLAY_ROW_CAP = 50


class FileDbShell:
    def __init__(self, engine: Engine):
        self.engine = engine
        self.cwd = "/"

    # -- dispatch (CLI/__init__.py:90-126 shape) ---------------------------
    def execute_input(self, line: str) -> str | None:
        line = (line or "").strip()
        if not line:
            return None
        cmd, _, arg = line.partition(" ")
        cmd = cmd.lower()
        arg = arg.strip()
        handler = getattr(self, f"do_{cmd}", None)
        if handler is None:
            return f"unknown command: {cmd}"
        return handler(arg)

    def _show(self, df: DataFrame) -> str:
        cap = int(self.engine.config.get("display_row_cap", DISPLAY_ROW_CAP))
        pdf = df.limit(cap).toPandas()
        return pdf.to_string(index=False, max_rows=cap)

    def _abs(self, path: str) -> str:
        if not path:
            return self.cwd
        if path.startswith(("/", "\\")) or (len(path) > 1 and path[1] == ":"):
            return path
        return path_join(self.cwd, path)

    # -- commands ----------------------------------------------------------
    def do_search(self, arg: str) -> str:
        return self._show(search_api.search_file(self.engine.listing(), arg))

    def do_search_dir(self, arg: str) -> str:
        return self._show(search_api.search_dir(self.engine.listing(), arg))

    def do_search_dup(self, arg: str) -> str:
        return self._show(self.engine.search_duplicate_file(self._abs(arg)))

    def do_dup_images(self, arg: str) -> str:
        """The DuplicateImageBrowser plugin's report (its query, minus
        the Tkinter shell): duplicate image groups under a dir prefix
        (`dup_images [dir-LIKE-pattern]`, default everywhere)."""
        return self._show(
            search_api.duplicate_media_groups(
                self.engine.file_detail(), dir_like=(arg or "%")
            )
        )

    def do_scrape_dir(self, arg: str) -> str:
        path = strip_trailing_slashes(self._abs(arg))
        self.engine.add_root(path)
        n = self.engine.crawl_once(limit=1000)
        return f"crawled {n} directories under {path}"

    def do_hash_file(self, arg: str) -> str:
        from .hashing import hash_file_local

        digests = hash_file_local(self._abs(arg))
        if digests is None:
            return "not a readable file"
        return f"md5: {digests[0]}\nsha1: {digests[1]}"

    def do_cd(self, arg: str) -> str:
        self.cwd = strip_trailing_slashes(self._abs(arg)) or "/"
        return self.cwd

    def do_pwd(self, arg: str) -> str:
        return self.cwd

    def do_ls(self, arg: str) -> str:
        from pyspark.sql import functions as F

        target = strip_trailing_slashes(self._abs(arg)) or self.cwd
        return self._show(
            self.engine.listing().where(F.col("dir_path") == target)
        )

    def do_schedule(self, arg: str) -> str:
        from pyspark.sql import functions as F

        from ..functions.paths import sql_sanitize_order_by

        control = self.engine.store.read("directory_control")
        order = sql_sanitize_order_by(arg or "next_crawl", control.columns)
        cols = [
            F.col(c).desc() if d == "desc" else F.col(c).asc() for c, d in order
        ] or [F.col("next_crawl").asc()]
        return self._show(control.orderBy(*cols))

    def do_exit(self, arg: str) -> str:
        return "bye"

    # -- loop --------------------------------------------------------------
    def repl(self) -> None:  # pragma: no cover - interactive
        while True:
            try:
                line = input(f"file_db {self.cwd}> ")
            except (EOFError, KeyboardInterrupt):
                break
            out = self.execute_input(line)
            if out:
                print(out)
            if line.strip().lower() == "exit":
                break
