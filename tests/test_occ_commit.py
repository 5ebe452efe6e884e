"""Optimistic-concurrency generation commits (serving_io, r15): two
writers racing on one versioned state root must never silently lose an
update. The commit protocol is claim-token CAS (exclusive create of
``_TXN_<base+1>``) plus a newest-committed-equals-base check; the loser's
populated directory is discarded and it retries from the new current.

Pinned here:
- a stale-base commit raises GenerationConflictError, leaves the winner's
  state byte-identical, and leaves NO stale generation behind;
- the retry path (re-read current_generation, recompute, commit) lands;
- a non-OCC writer advancing the root also conflicts a stale OCC commit
  (the token alone is not trusted);
- a crashed claimant's orphan token blocks same-base OCC commits until
  vacuum_generations sweeps it by storage-clock age;
- a mistaken too-high base releases its claimed future token on failure;
- expected_base without keep_generations is refused by hash_layout_save.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from cinegraph_spark.operators.maintenance import (
    hash_layout_save,
    layout_read,
)
from cinegraph_spark.operators.serving_io import (
    GenerationConflictError,
    current_generation,
    list_generations,
    vacuum_generations,
)


def _mk(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id"), (F.col("id") * 10).alias("val")
    )


def _ids(spark, root, **kw):
    return sorted(
        r["id"] for r in layout_read(spark, root, **kw).collect()
    )


def _gens_dir(root):
    return os.path.join(root, "_gens")


def test_occ_first_save_and_stale_base_conflict(spark, tmp_path):
    root = str(tmp_path / "t")
    assert current_generation(spark, root) == 0  # fresh root
    hash_layout_save(
        _mk(spark, 0, 4), root, "id", 2, keep_generations=3,
        expected_base=0,
    )
    assert current_generation(spark, root) == 1

    # two writers both read base=1; A commits first
    base = current_generation(spark, root)
    hash_layout_save(
        _mk(spark, 0, 6), root, "id", 2, keep_generations=3,
        expected_base=base,
    )
    with pytest.raises(GenerationConflictError, match="expected base"):
        hash_layout_save(
            _mk(spark, 0, 9), root, "id", 2, keep_generations=3,
            expected_base=base,
        )
    # winner's state intact, loser left no committed generation
    assert _ids(spark, root) == list(range(6))
    assert sorted(list_generations(spark, root)) == [1, 2]
    # and no uncommitted debris either: the loser's dir was discarded
    leftovers = [
        d for d in os.listdir(_gens_dir(root)) if d.startswith("g")
    ]
    assert sorted(leftovers) == ["g00000001", "g00000002"]

    # retry from the NEW current lands as generation 3
    hash_layout_save(
        _mk(spark, 0, 9), root, "id", 2, keep_generations=3,
        expected_base=current_generation(spark, root),
    )
    assert _ids(spark, root) == list(range(9))
    assert current_generation(spark, root) == 3
    # successful commits sweep dead tokens
    assert not [
        t for t in os.listdir(_gens_dir(root)) if t.startswith("_TXN_")
    ]


def test_non_occ_writer_conflicts_stale_occ_commit(spark, tmp_path):
    root = str(tmp_path / "t")
    hash_layout_save(
        _mk(spark, 0, 4), root, "id", 2, keep_generations=3,
        expected_base=0,
    )
    base = current_generation(spark, root)
    # a plain (non-OCC) save advances the root without any token
    hash_layout_save(_mk(spark, 0, 5), root, "id", 2, keep_generations=3)
    with pytest.raises(GenerationConflictError):
        hash_layout_save(
            _mk(spark, 0, 9), root, "id", 2, keep_generations=3,
            expected_base=base,
        )
    assert _ids(spark, root) == list(range(5))


def test_orphan_token_blocks_until_vacuumed(spark, tmp_path):
    import time

    root = str(tmp_path / "t")
    hash_layout_save(
        _mk(spark, 0, 4), root, "id", 2, keep_generations=3,
        expected_base=0,
    )
    base = current_generation(spark, root)
    # simulate a claimant that crashed between claim and commit
    orphan = os.path.join(_gens_dir(root), f"_TXN_{base + 1:08d}")
    open(orphan, "w").close()
    with pytest.raises(GenerationConflictError, match="claimed"):
        hash_layout_save(
            _mk(spark, 0, 6), root, "id", 2, keep_generations=3,
            expected_base=base,
        )
    # age the orphan past retention and vacuum — OCC commits resume
    stale_t = time.time() - 48 * 3600
    os.utime(orphan, (stale_t, stale_t))
    vacuum_generations(spark, root, keep=3, older_than_hours=24.0)
    assert not os.path.exists(orphan)
    hash_layout_save(
        _mk(spark, 0, 6), root, "id", 2, keep_generations=3,
        expected_base=base,
    )
    assert _ids(spark, root) == list(range(6))


def test_too_high_base_releases_future_token(spark, tmp_path):
    root = str(tmp_path / "t")
    hash_layout_save(
        _mk(spark, 0, 4), root, "id", 2, keep_generations=3,
        expected_base=0,
    )
    # caller bug: base beyond current — the claim succeeds (future
    # token) but the newest-check fails; the token must be released so
    # the eventual legitimate transition is not squatted
    with pytest.raises(GenerationConflictError):
        hash_layout_save(
            _mk(spark, 0, 6), root, "id", 2, keep_generations=3,
            expected_base=7,
        )
    assert not [
        t for t in os.listdir(_gens_dir(root)) if t.startswith("_TXN_")
    ]
    hash_layout_save(
        _mk(spark, 0, 6), root, "id", 2, keep_generations=3,
        expected_base=current_generation(spark, root),
    )
    assert _ids(spark, root) == list(range(6))


def test_expected_base_requires_generations(spark, tmp_path):
    with pytest.raises(ValueError, match="requires keep_generations"):
        hash_layout_save(
            _mk(spark, 0, 4), str(tmp_path / "t"), "id", 2,
            expected_base=0,
        )


# --- snapshot CDC between generations (layout_generation_diff) ---------


def test_generation_diff_classifies_exactly(spark, tmp_path):
    from cinegraph_spark.operators.maintenance import (
        layout_generation_diff,
    )

    root = str(tmp_path / "t")
    g1 = spark.createDataFrame(
        [(1, 10), (2, 20), (3, 30), (4, 40)], "id long, val long"
    )
    # gen2: key 2 deleted, key 3 updated, key 9 inserted, 1/4 unchanged
    g2 = spark.createDataFrame(
        [(1, 10), (3, 31), (4, 40), (9, 90)], "id long, val long"
    )
    hash_layout_save(g1, root, "id", 2, keep_generations=2)
    hash_layout_save(g2, root, "id", 2, keep_generations=2)
    got = {
        (r["id"], r["change"])
        for r in layout_generation_diff(spark, root, 1, 2).collect()
    }
    assert got == {(2, "delete"), (3, "update"), (9, "insert")}
    # reversed direction flips insert/delete and keeps update
    rev = {
        (r["id"], r["change"])
        for r in layout_generation_diff(spark, root, 2, 1).collect()
    }
    assert rev == {(2, "insert"), (3, "update"), (9, "delete")}


def test_generation_diff_sees_dv_masks_and_schema_guard(spark, tmp_path):
    from cinegraph_spark.operators.maintenance import (
        layout_dv_delete,
        layout_generation_diff,
    )

    root = str(tmp_path / "t")
    g = spark.createDataFrame(
        [(1, 10), (2, 20), (3, 30)], "id long, val long"
    )
    hash_layout_save(g, root, "id", 2, keep_generations=2)
    hash_layout_save(g, root, "id", 2, keep_generations=2)
    # DV-mask key 2 in the CURRENT generation: the diff reads through
    # layout_read, so the mask shows as a delete before any compaction
    layout_dv_delete(
        spark, root, spark.createDataFrame([(2,)], "id long")
    )
    got = {
        (r["id"], r["change"])
        for r in layout_generation_diff(spark, root, 1, 2).collect()
    }
    assert got == {(2, "delete")}
    # a schema-evolved re-save refuses the diff by name
    hash_layout_save(
        g.withColumn("extra", F.lit(1)), root, "id", 2,
        keep_generations=2,
    )
    with pytest.raises(ValueError, match="different schemas"):
        layout_generation_diff(spark, root, 2, 3)


# --- review findings: allocation exclusivity, error classification -----


def test_allocation_claim_prevents_shared_staging_dir(spark, tmp_path):
    """Two writers that both list _gens before either writes must not
    stage into one directory: allocation is an exclusive claim-file
    create, so a dir-less outstanding claim (a racing writer mid-
    populate) forces the next allocator to the next number."""
    import time

    root = str(tmp_path / "t")
    hash_layout_save(_mk(spark, 0, 4), root, "id", 2, keep_generations=3)
    # a racing writer holds the claim for g2 but has not written yet
    racer_claim = os.path.join(_gens_dir(root), "_ALLOC_g00000002")
    open(racer_claim, "w").close()
    hash_layout_save(_mk(spark, 0, 6), root, "id", 2, keep_generations=3)
    # the new save skipped the claimed number: it landed as g3
    assert current_generation(spark, root) == 3
    assert not os.path.isdir(os.path.join(_gens_dir(root), "g00000002"))
    # the dir-less claim SURVIVES the commit sweep (its writer may be
    # live mid-populate)
    assert os.path.exists(racer_claim)
    # below the committed frontier it is allocation-irrelevant, so
    # vacuum clears it regardless of age
    vacuum_generations(spark, root, keep=3, older_than_hours=24.0)
    assert not os.path.exists(racer_claim)
    # ABOVE the frontier, a young dir-less claim is live-writer
    # material: vacuum keeps it until the age bound passes
    live_claim = os.path.join(_gens_dir(root), "_ALLOC_g00000009")
    open(live_claim, "w").close()
    vacuum_generations(spark, root, keep=3, older_than_hours=24.0)
    assert os.path.exists(live_claim)
    stale_t = time.time() - 48 * 3600
    os.utime(live_claim, (stale_t, stale_t))
    vacuum_generations(spark, root, keep=3, older_than_hours=24.0)
    assert not os.path.exists(live_claim)
    # our own claims were swept at commit (their dirs exist)
    assert not [
        c for c in os.listdir(_gens_dir(root)) if c.startswith("_ALLOC_")
    ]


def test_occ_loser_releases_claim_and_sequence_reuses_number(
    spark, tmp_path
):
    root = str(tmp_path / "t")
    hash_layout_save(
        _mk(spark, 0, 4), root, "id", 2, keep_generations=3,
        expected_base=0,
    )
    base = current_generation(spark, root)
    hash_layout_save(
        _mk(spark, 0, 5), root, "id", 2, keep_generations=3,
        expected_base=base,
    )
    with pytest.raises(GenerationConflictError):
        hash_layout_save(
            _mk(spark, 0, 9), root, "id", 2, keep_generations=3,
            expected_base=base,
        )
    # the loser released BOTH its claim file and its staging dir
    leftovers = sorted(os.listdir(_gens_dir(root)))
    assert not [x for x in leftovers if x.startswith("_ALLOC_")]
    assert "g00000003" not in leftovers


def test_is_already_exists_classifier():
    from cinegraph_spark.operators.serving_io import _is_already_exists

    assert not _is_already_exists(IOError("connection reset"))
    assert _is_already_exists(IOError("File already exists: /x/_TXN_1"))

    class FakeJava:
        def getClass(self):
            class C:
                def getName(self):
                    return (
                        "org.apache.hadoop.fs.FileAlreadyExistsException"
                    )

            return C()

    e = IOError("opaque")
    e.java_exception = FakeJava()
    assert _is_already_exists(e)


def test_generation_diff_handles_duplicate_keys(spark, tmp_path):
    from cinegraph_spark.operators.maintenance import (
        layout_generation_diff,
    )

    root = str(tmp_path / "t")
    dup = spark.createDataFrame(
        [(1, 10), (1, 11), (2, 20)], "id long, val long"
    )
    hash_layout_save(dup, root, "id", 2, keep_generations=2)
    hash_layout_save(dup, root, "id", 2, keep_generations=2)
    # identical duplicate-key content: NO spurious updates
    assert layout_generation_diff(spark, root, 1, 2).count() == 0
    # multiplicity change IS a change
    hash_layout_save(
        spark.createDataFrame([(1, 10), (2, 20)], "id long, val long"),
        root, "id", 2, keep_generations=2,
    )
    got = {
        (r["id"], r["change"])
        for r in layout_generation_diff(spark, root, 2, 3).collect()
    }
    assert got == {(1, "update")}


def test_generation_diff_map_key_order_canonical(spark, tmp_path):
    """to_json's map key order is storage order, not canonical: two
    logically-equal map payloads written with different insertion order
    must NOT diff as an update (r15 ADVICE). A real value change still
    must."""
    from cinegraph_spark.operators.maintenance import (
        layout_generation_diff,
    )

    root = str(tmp_path / "t")
    g1 = spark.createDataFrame([(1,), (2,)], "id long").select(
        "id",
        F.create_map(
            F.lit("a"), F.col("id") * 10, F.lit("b"), F.col("id") * 100
        ).alias("m"),
    )
    # same logical maps, reversed insertion order
    g2 = spark.createDataFrame([(1,), (2,)], "id long").select(
        "id",
        F.create_map(
            F.lit("b"), F.col("id") * 100, F.lit("a"), F.col("id") * 10
        ).alias("m"),
    )
    hash_layout_save(g1, root, "id", 2, keep_generations=3)
    hash_layout_save(g2, root, "id", 2, keep_generations=3)
    assert layout_generation_diff(spark, root, 1, 2).count() == 0
    # a genuine value change under one key IS an update
    g3 = spark.createDataFrame([(1,), (2,)], "id long").select(
        "id",
        F.create_map(
            F.lit("b"), F.col("id") * 100, F.lit("a"), F.col("id") * 11
        ).alias("m"),
    )
    hash_layout_save(g3, root, "id", 2, keep_generations=3)
    got = {
        (r["id"], r["change"])
        for r in layout_generation_diff(spark, root, 2, 3).collect()
    }
    assert got == {(1, "update"), (2, "update")}


def test_generation_diff_refuses_nested_map_payload(spark, tmp_path):
    from cinegraph_spark.operators.maintenance import (
        layout_generation_diff,
    )

    root = str(tmp_path / "t")
    g = spark.createDataFrame([(1,), (2,)], "id long").select(
        "id",
        F.struct(
            F.create_map(F.lit("a"), F.col("id")).alias("inner")
        ).alias("s"),
    )
    hash_layout_save(g, root, "id", 2, keep_generations=2)
    hash_layout_save(g, root, "id", 2, keep_generations=2)
    with pytest.raises(ValueError, match="nests a map"):
        layout_generation_diff(spark, root, 1, 2).count()


def test_occ_local_scheme_is_atomic_and_silent(spark, tmp_path):
    """file:// claims go through O_CREAT|O_EXCL (r16) — genuinely
    atomic — so OCC commits on local roots neither warn nor belong in
    _NON_ATOMIC_CREATE_SCHEMES; the best-effort warning is reserved for
    the S3-class schemes that have no exclusive create at all (r15
    ADVICE)."""
    import warnings as _w

    from cinegraph_spark.operators import serving_io

    assert "file" not in serving_io._NON_ATOMIC_CREATE_SCHEMES
    assert serving_io._NON_ATOMIC_CREATE_SCHEMES >= {"s3a"}
    root = str(tmp_path / "t")
    with _w.catch_warnings():
        _w.simplefilter("error", RuntimeWarning)
        hash_layout_save(
            _mk(spark, 0, 4), root, "id", 2, keep_generations=3,
            expected_base=0,
        )
        hash_layout_save(
            _mk(spark, 0, 6), root, "id", 2, keep_generations=3
        )
    # a claim file left by a racer is still honored by the O_EXCL path
    orphan = os.path.join(_gens_dir(root), "_TXN_00000003")
    open(orphan, "w").close()
    with pytest.raises(GenerationConflictError, match="claimed"):
        hash_layout_save(
            _mk(spark, 0, 8), root, "id", 2, keep_generations=3,
            expected_base=2,
        )


@pytest.mark.slow
def test_occ_threaded_writers_no_lost_update(spark, tmp_path):
    """r15 verdict task 7 — OCC under REAL concurrency, not simulated
    interleaving: four threads hammer one versioned root with
    expected_base commits, retrying on conflict. The no-lost-update law:
    every successful commit consumed a DISTINCT base (the committed
    lineage is a chain, never a fork), generations end exactly at the
    success count, and the final content carries the last link's value.

    History: the first run of this herd THROUGH Hadoop's
    RawLocalFileSystem create(overwrite=False) produced duplicate bases
    and generation gaps immediately — its exists-then-create is not a
    nanosecond theoretical window under contention. That finding drove
    the O_CREAT|O_EXCL claim path for file: roots (_exclusive_create,
    r16), which this test now holds to the exact chain law."""
    import threading

    root = str(tmp_path / "t")
    n_threads, n_commits = 4, 4
    lock = threading.Lock()
    successes: list[tuple[int, int]] = []
    errors: list[str] = []

    def writer(tid: int) -> None:
        try:
            done, attempts = 0, 0
            while done < n_commits:
                attempts += 1
                assert attempts < 200, "livelock: conflict retries runaway"
                base = current_generation(spark, root)
                df = spark.createDataFrame(
                    [(0, base + 1)], "id long, val long"
                )
                try:
                    hash_layout_save(
                        df, root, "id", 1, keep_generations=2,
                        expected_base=base,
                    )
                except GenerationConflictError:
                    continue  # re-read, recompute, retry — the contract
                done += 1
                with lock:
                    successes.append((tid, base))
        except Exception as e:  # surface thread failures to the assert
            errors.append(f"thread {tid}: {e!r}")

    threads = [
        threading.Thread(target=writer, args=(i,))
        for i in range(n_threads)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=300)
    assert not errors, errors
    total = n_threads * n_commits
    assert len(successes) == total
    # THE no-lost-update law: every success consumed a DISTINCT base —
    # two commits from one base is a fork, i.e. a silently dropped
    # update. (Generation NUMBERS are allocation numbers, not commit
    # counts: in-flight staging directories push max(existing)+1 past
    # the committed frontier, so numbers legitimately skip — the chain
    # law lives on bases, not on number density.)
    bases = sorted(b for _, b in successes)
    assert len(set(bases)) == total, f"forked bases: {bases}"
    assert bases[0] == 0  # the chain starts at the fresh root
    # the newest committed generation is the LAST success's commit, and
    # its payload (val = base+1 at compute time) must reflect a base
    # equal to the committed frontier every earlier success built — a
    # lost update would leave a smaller val behind
    final = [
        (r["id"], r["val"]) for r in layout_read(spark, root).collect()
    ]
    assert final == [(0, max(bases) + 1)]
    # the committed NUMBER may exceed base+1 (numbers skip past other
    # writers' in-flight staging dirs), but never trail it
    assert current_generation(spark, root) >= max(bases) + 1
    # and no transaction-token debris survives the winners' sweeps +
    # the losers' own releases
    leftover = [
        x for x in os.listdir(_gens_dir(root)) if x.startswith("_TXN_")
    ]
    assert leftover == []


def test_exclusive_create_hadoop_branch_classification():
    """The non-file branch of _exclusive_create must return False ONLY
    for an already-exists failure and propagate everything else — a
    transient IO error misread as a lost race would silently cost a
    writer its computed state (the r15 review class, now behind one
    helper)."""
    from cinegraph_spark.operators.serving_io import _exclusive_create

    class FakeUri:
        def __init__(self, scheme):
            self._s = scheme

        def getScheme(self):
            return self._s

    class FakeStream:
        def close(self):
            pass

    class FakeFs:
        def __init__(self, scheme, exc=None):
            self._uri, self._exc = FakeUri(scheme), exc
            self.created = []

        def getUri(self):
            return self._uri

        def create(self, path, overwrite):
            assert overwrite is False
            if self._exc is not None:
                raise self._exc
            self.created.append(str(path))
            return FakeStream()

    jpath = lambda p: p  # noqa: E731
    ok_fs = FakeFs("hdfs")
    assert _exclusive_create(ok_fs, jpath, "/x/_TXN_1") is True
    assert ok_fs.created == ["/x/_TXN_1"]
    exists = IOError("File already exists: /x/_TXN_1")
    assert (
        _exclusive_create(FakeFs("hdfs", exists), jpath, "/x/_TXN_1")
        is False
    )
    import pytest as _pytest

    with _pytest.raises(IOError, match="connection reset"):
        _exclusive_create(
            FakeFs("hdfs", IOError("connection reset")), jpath, "/x/_TXN_1"
        )


def test_exclusive_create_local_branch_is_o_excl(tmp_path):
    """The file: branch claims via O_CREAT|O_EXCL — second claim of the
    same path loses, parents are created implicitly, and a file: URI
    prefix is stripped."""
    from cinegraph_spark.operators.serving_io import _exclusive_create

    class FakeUri:
        def getScheme(self):
            return "file"

    class FakeFs:
        def getUri(self):
            return FakeUri()

    fs, jpath = FakeFs(), (lambda p: p)
    target = str(tmp_path / "deep" / "nested" / "_TXN_1")
    assert _exclusive_create(fs, jpath, target) is True
    assert _exclusive_create(fs, jpath, target) is False
    import os

    assert os.path.exists(target)
    uri_target = "file:" + str(tmp_path / "deep" / "_ALLOC_g1")
    assert _exclusive_create(fs, jpath, uri_target) is True
    assert os.path.exists(str(tmp_path / "deep" / "_ALLOC_g1"))

    # a URI with an authority must NOT be claimed at '/localhost/...'
    # (naive scheme-stripping did exactly that, r16 ADVICE) — all three
    # spellings of the same root contend for ONE file
    auth_target = "file://localhost" + str(tmp_path / "deep" / "_TXN_2")
    assert _exclusive_create(fs, jpath, auth_target) is True
    assert os.path.exists(str(tmp_path / "deep" / "_TXN_2"))
    assert not os.path.exists("/localhost" + str(tmp_path)[: len("/x")])
    assert _exclusive_create(fs, jpath, str(tmp_path / "deep" / "_TXN_2")) is False
    assert (
        _exclusive_create(fs, jpath, "file://" + str(tmp_path / "deep" / "_TXN_2"))
        is False
    )

    # percent-encoded characters decode before the claim
    enc_target = "file:" + str(tmp_path / "deep") + "/_TXN%203"
    assert _exclusive_create(fs, jpath, enc_target) is True
    assert os.path.exists(str(tmp_path / "deep" / "_TXN 3"))
