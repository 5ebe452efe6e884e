"""File-per-document text SINK (S3) as a Spark 4 Python Data Source writer.

Reference behavior being re-expressed (SURVEY §2.1 S3): the scraper saves
one subtitle file per movie named ``{title}_{year}.txt`` with spaces
mangled to underscores (``scraping/scraper.py:137-153``). The read side of
that convention lives in :mod:`cinegraph_spark.sources.text_corpus`; this
module closes the WRITE side as a real custom connector rather than a
driver loop:

- ``write()`` runs once per executor task and writes the files for ITS
  partition only — the reference's serial save loop becomes N parallel
  writers, and no document text ever lands on the driver;
- tasks STAGE their output under ``<path>/_staging/<task-uuid>/``:
  Hadoop-style readers ignore ``_``-prefixed paths, so no file is visible
  until commit, and Spark's job-level ``abort(messages)`` carries ``None``
  for any task that did not fully commit (measured on Spark 4.1 — a
  failing job handed abort ``[None, None]`` even though one task had
  finished its writes), which means in-place writes CANNOT be cleaned
  from commit messages alone. Staging sidesteps that: ``abort()`` removes
  the whole staging subtree;
- the driver's ``commit()`` moves every staged file into place and then
  publishes ``_MANIFEST`` — the all-or-nothing visibility flip a catalog
  commit gives at real scale (the moves are metadata ops, the same shape
  as a Hadoop job-commit protocol's driver-side rename pass).

Constraint (standard for directory sinks): one writing job per target
directory at a time — abort sweeps ``_staging`` wholesale.

Input schema contract: ``(fname string, content string)`` — callers do the
title mangle themselves (P3/F-family column expressions), keeping the sink
generic.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceWriter,
    WriterCommitMessage,
)


@dataclass
class FilesWritten(WriterCommitMessage):
    files: tuple[str, ...]


class TextFilesDataSource(DataSource):
    """``df.write.format("cinegraph_textfiles").option("path", dir)``."""

    @classmethod
    def name(cls) -> str:
        return "cinegraph_textfiles"

    def writer(self, schema, overwrite: bool) -> "TextFilesWriter":
        return TextFilesWriter(self.options, overwrite)


class TextFilesWriter(DataSourceWriter):
    def __init__(self, options: dict, overwrite: bool):
        path = options.get("path")
        if not path:
            raise ValueError("cinegraph_textfiles requires option('path', dir)")
        if overwrite:
            # mode('overwrite') would silently MERGE with a prior delivery
            # (files are keyed by name; only colliding names would be
            # replaced) — refuse loudly rather than imply truncate
            # semantics this sink does not implement.
            raise ValueError(
                "cinegraph_textfiles supports append mode only; write each "
                "delivery to its own directory (the _MANIFEST is the "
                "visibility boundary)"
            )
        if os.path.exists(os.path.join(path, "_MANIFEST")):
            # one delivery per directory is the documented contract; a
            # second append would rewrite _MANIFEST with only ITS names,
            # silently hiding the earlier delivery from manifest-honoring
            # readers (and colliding fnames would be overwritten). Enforce
            # rather than document.
            raise ValueError(
                f"cinegraph_textfiles: {path!r} already holds a committed "
                "delivery (_MANIFEST present); write each delivery to its "
                "own directory"
            )
        self.path = path

    @property
    def _staging(self) -> str:
        return os.path.join(self.path, "_staging")

    @staticmethod
    def _validate_fname(fname) -> str:
        """Reject names that would escape the staging dir (path separators,
        ``..``), collide with the commit protocol (``_`` prefix is invisible
        to Hadoop-style readers and reserved for _staging/_MANIFEST), or be
        unaddressable (empty), or corrupt the newline-delimited
        ``_MANIFEST`` (control characters — ``'a\\nb.txt'`` would write
        fine but split into two bogus manifest entries, so
        manifest-honoring readers would miss the real file)."""
        if not fname:
            raise ValueError("cinegraph_textfiles: empty fname")
        bad = os.sep in fname or (os.altsep and os.altsep in fname)
        if bad or fname in (".", "..") or fname.startswith("_"):
            raise ValueError(
                f"cinegraph_textfiles: invalid fname {fname!r} (path "
                "separators, '..', and '_' prefix are not allowed)"
            )
        if any(ord(c) < 0x20 or ord(c) == 0x7F for c in fname):
            raise ValueError(
                f"cinegraph_textfiles: invalid fname {fname!r} (control "
                "characters would corrupt the newline-delimited _MANIFEST)"
            )
        return fname

    def write(self, iterator: Iterator) -> FilesWritten:
        """Executor-side: stage this partition's files under a task-unique
        directory. Nothing is visible to readers (``_``-prefixed paths are
        ignored by Hadoop-style listings) until the driver commits; a
        speculative duplicate of this task stages under a different uuid
        and simply loses the commit race for identical content."""
        import uuid

        task_dir = os.path.join(self._staging, uuid.uuid4().hex)
        os.makedirs(task_dir, exist_ok=True)
        written = []
        seen: set[str] = set()
        for row in iterator:
            name = self._validate_fname(row.fname)
            if name in seen:
                # same-partition duplicates would silently overwrite each
                # other inside this task_dir (open 'w'); commit() would
                # never even see the doubled name. Fail in the task.
                raise ValueError(
                    f"cinegraph_textfiles: duplicate fname {name!r} within "
                    "a partition — each row must have a unique fname"
                )
            seen.add(name)
            with open(
                os.path.join(task_dir, name), "w", encoding="utf-8"
            ) as fh:
                fh.write(row.content)
            written.append(name)
        return FilesWritten(tuple(os.path.join(task_dir, n) for n in written))

    def commit(self, messages) -> None:
        """Driver-side, after EVERY task committed: move staged files into
        place (metadata ops — the Hadoop job-commit shape), publish the
        manifest, clear staging. Readers that honor ``_MANIFEST`` never
        observe a partial delivery."""
        import shutil

        # validate the WHOLE delivery before publishing any file: a
        # duplicate basename across tasks would silently overwrite one
        # row's content with another's. Raising here publishes nothing —
        # no file has moved and no manifest exists.
        staged_names: list[tuple[str, str]] = []
        seen: set[str] = set()
        for m in messages:
            if m is None:
                continue
            for staged in m.files:
                name = os.path.basename(staged)
                if name in seen:
                    raise ValueError(
                        f"cinegraph_textfiles: duplicate fname {name!r} "
                        "across partitions — each row must have a unique "
                        "fname"
                    )
                seen.add(name)
                staged_names.append((staged, name))
        for staged, name in staged_names:
            os.replace(staged, os.path.join(self.path, name))
        names = sorted(seen)
        # temp + os.replace: a crash mid-commit must not leave moved files
        # beside a truncated manifest — the rename is the atomic
        # visibility flip.
        tmp = os.path.join(self.path, "_MANIFEST.tmp")
        with open(tmp, "w") as fh:
            fh.write("\n".join(names) + ("\n" if names else ""))
        os.replace(tmp, os.path.join(self.path, "_MANIFEST"))
        shutil.rmtree(self._staging, ignore_errors=True)

    def abort(self, messages) -> None:
        """Driver-side on job failure: drop the whole staging subtree.
        Commit messages are NOT consulted — Spark hands ``None`` for tasks
        that had not fully committed (measured), so the staging sweep is
        the only reliable cleanup; no visible file was published, so the
        target directory is exactly as it was before the job."""
        import shutil

        shutil.rmtree(self._staging, ignore_errors=True)


def _register(spark) -> None:
    """Register pickled-by-value (same foreign-cwd lesson as the listing
    source: the planner re-imports the class on executors/driver workers
    where this repo is not on sys.path)."""
    from pyspark import cloudpickle

    import cinegraph_spark.sources.textsink as _self

    cloudpickle.register_pickle_by_value(_self)
    spark.dataSource.register(TextFilesDataSource)


def write_text_files(df, path: str) -> None:
    """Write a ``(fname, content)`` frame through the sink (append mode —
    the manifest is the visibility boundary, not directory emptiness)."""
    _register(df.sparkSession)
    (
        df.write.format("cinegraph_textfiles")
        .option("path", path)
        .mode("append")
        .save()
    )
