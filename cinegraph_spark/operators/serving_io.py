"""Shared serving-table IO: atomic sibling-swap writes.

A serving table (the HNSW blob table, the IVF centroids table) is live
state that query jobs read between maintenance runs. Spark's
``mode("overwrite")`` deletes the old table BEFORE the new one is
computed, so a driver/executor death mid-write destroys the index with
no recovery (r11 ADVICE on ``operators/hnsw.py``). Every maintenance
write therefore goes through :func:`atomic_swap_write` instead.
"""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import DataFrame


@contextmanager
def atomic_swap_dir(spark, path: str):
    """Yield a unique sibling directory to populate (one or several
    sub-tables); on clean exit, swap it into ``path`` (delete old, rename
    new). The multi-table form of :func:`atomic_swap_write` — a serving
    state made of several parquet tables (e.g. PQ codebooks + codes) must
    flip as ONE unit, or a crash between the two writes leaves a
    books/codes mismatch. Same crash contract: everything is durably
    under the sibling before the old directory is touched, and the
    sibling survives a mid-swap crash as the recovery copy. On an
    exception inside the block, ``path`` is left untouched (the partial
    sibling remains for inspection) and the exception propagates."""
    import uuid

    tmp = path.rstrip("/") + "__swap__" + uuid.uuid4().hex[:12]
    yield tmp
    jpath = spark._jvm.org.apache.hadoop.fs.Path
    dest, src = jpath(path), jpath(tmp)
    fs = dest.getFileSystem(spark._jsc.hadoopConfiguration())
    if fs.exists(dest):
        fs.delete(dest, True)
    if not fs.rename(src, dest):
        raise IOError(
            f"atomic swap rename {tmp} -> {path} failed; the freshly "
            f"written state is intact at {tmp} for manual recovery"
        )


def atomic_swap_write(df: DataFrame, path: str) -> None:
    """Durably write ``df`` to a unique sibling directory, then swap it
    into ``path`` (delete old, rename new). The new table is fully on
    storage before the old directory is touched — the remaining crash
    window is a metadata-only delete+rename, and the written sibling
    survives any crash for manual recovery (the rename failure path
    names it). Uses the Hadoop FileSystem of ``path`` so the same code
    serves file://, HDFS, and rename-capable object stores; a lakehouse
    deployment would flip a table-format version pointer instead.

    Reading ``path`` lazily inside ``df`` is safe: the old files persist
    until after the sibling write completes (this is what lets
    maintenance paths union carried-over rows with rebuilt ones without
    a checkpoint)."""
    with atomic_swap_dir(df.sparkSession, path) as tmp:
        df.write.parquet(tmp)
