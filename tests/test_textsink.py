"""The text-files Python Data Source WRITER's transactional contract:
commit publishes a manifest listing exactly the written files; a failed
job's abort removes every file the finished tasks wrote (no partial
delivery visible to a retry).
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from cinegraph_spark.sources.textsink import write_text_files


def test_commit_writes_manifest_of_all_files(spark, tmp_path):
    out = f"{tmp_path}/sink"
    df = spark.createDataFrame(
        [(f"doc_{i}.txt", f"content {i}") for i in range(7)],
        "fname string, content string",
    ).repartition(3)
    write_text_files(df, out)
    names = sorted(
        n for n in os.listdir(out) if not n.startswith("_")
    )
    assert names == [f"doc_{i}.txt" for i in range(7)]
    with open(f"{out}/_MANIFEST") as fh:
        manifest = fh.read().splitlines()
    assert manifest == names
    assert open(f"{out}/doc_3.txt").read() == "content 3"


def test_abort_removes_partial_output(spark, tmp_path):
    out = f"{tmp_path}/sink"

    @F.udf("string")
    def poison(fname):
        if fname == "boom.txt":
            raise RuntimeError("injected task failure")
        return fname

    # two partitions: one succeeds (its task returns a commit message),
    # one raises -> the job fails -> abort() must remove the survivors
    ok = spark.createDataFrame(
        [(f"doc_{i}.txt", "x") for i in range(4)],
        "fname string, content string",
    ).coalesce(1)
    bad = spark.createDataFrame(
        [("boom.txt", "x")], "fname string, content string"
    ).coalesce(1)
    df = ok.unionAll(bad).select(
        poison(F.col("fname")).alias("fname"), "content"
    )
    with pytest.raises(Exception):
        write_text_files(df, out)
    leftovers = sorted(os.listdir(out)) if os.path.isdir(out) else []
    # no visible files, no manifest, and the staging subtree is swept
    assert leftovers == []


def test_second_delivery_into_committed_dir_refused(spark, tmp_path):
    # one delivery per directory: a second append would rewrite _MANIFEST
    # with only its own names, hiding the first delivery from
    # manifest-honoring readers
    out = f"{tmp_path}/sink"
    df = spark.createDataFrame(
        [("a.txt", "x")], "fname string, content string"
    )
    write_text_files(df, out)
    df2 = spark.createDataFrame(
        [("b.txt", "y")], "fname string, content string"
    )
    with pytest.raises(Exception, match="already holds a committed"):
        write_text_files(df2, out)
    # the first delivery is untouched
    with open(f"{out}/_MANIFEST") as fh:
        assert fh.read().splitlines() == ["a.txt"]


def test_duplicate_fnames_across_partitions_refused(spark, tmp_path):
    # two rows, two partitions, same fname: commit() must refuse before
    # publishing anything (a silent overwrite would lose one row)
    out = f"{tmp_path}/sink"
    df = spark.createDataFrame(
        [("dup.txt", "left"), ("dup.txt", "right")],
        "fname string, content string",
    ).repartition(2)
    with pytest.raises(Exception, match="duplicate fname"):
        write_text_files(df, out)
    visible = (
        [n for n in os.listdir(out) if not n.startswith("_")]
        if os.path.isdir(out)
        else []
    )
    assert visible == []
    assert not os.path.exists(f"{out}/_MANIFEST")


def test_duplicate_fnames_within_partition_refused(spark, tmp_path):
    # same fname twice in ONE partition: the second open('w') in the same
    # task_dir would silently overwrite the first, and commit() would see
    # only one staged file — the task itself must refuse
    out = f"{tmp_path}/sink"
    df = spark.createDataFrame(
        [("dup.txt", "left"), ("dup.txt", "right")],
        "fname string, content string",
    ).coalesce(1)
    with pytest.raises(Exception, match="duplicate fname.*within"):
        write_text_files(df, out)
    visible = (
        [n for n in os.listdir(out) if not n.startswith("_")]
        if os.path.isdir(out)
        else []
    )
    assert visible == []
    assert not os.path.exists(f"{out}/_MANIFEST")


@pytest.mark.parametrize(
    "fname",
    ["../escape.txt", "sub/dir.txt", "_hidden.txt", "", "a\nb.txt", "a\rb.txt"],
)
def test_hostile_fnames_rejected(spark, tmp_path, fname):
    # path separators / '..' would escape the staging dir; '_' prefix is
    # invisible to Hadoop-style readers and reserved for the protocol
    out = f"{tmp_path}/sink"
    df = spark.createDataFrame(
        [(fname, "x")], "fname string, content string"
    )
    with pytest.raises(Exception, match="fname"):
        write_text_files(df, out)
    escaped = os.path.join(tmp_path, "escape.txt")
    assert not os.path.exists(escaped)
    assert not os.path.exists(f"{out}/_MANIFEST")


def test_overwrite_mode_refused(spark, tmp_path):
    df = spark.createDataFrame(
        [("a.txt", "x")], "fname string, content string"
    )
    from cinegraph_spark.sources.textsink import _register

    _register(spark)
    with pytest.raises(Exception, match="append mode only"):
        (
            df.write.format("cinegraph_textfiles")
            .option("path", f"{tmp_path}/sink")
            .mode("overwrite")
            .save()
        )
