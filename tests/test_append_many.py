"""Catalog.append_many / Transaction — the multi-table atomic append
primitive (SURVEY §7.2's multi-table WAP hard part; the reference
serializes one commit per table and punts cross-table atomicity,
``README.md:18``).

Contract pinned here:
- all N tables' rows land in ONE commit (one log entry, one ref hop);
- readers at any commit see all tables updated or none;
- concurrent file writes produce the same result as sequential;
- ``expected_head`` pins the CAS base so a commit landing after the
  caller's read fails the publish (read-check-publish);
- zero-row entries are elided, all-empty calls commit nothing;
- repeating a table chains one snapshot per entry, in order;
- Transaction defers everything to a clean ``with``-exit.
"""

import threading

import pytest
from pyspark.sql import functions as F

from no_jvm_wap_with_iceberg_spark.catalog import (
    Catalog,
    CommitConflict,
    TableMetadata,
)


def _df(spark, lo, hi, name="x"):
    return spark.range(lo, hi).select(
        F.col("id"), F.lit(name).alias("name")
    )


def _setup(spark, cat, tables=("ta", "tb")):
    schema = _df(spark, 0, 1).schema
    for t in tables:
        cat.create_table(t, schema)


def test_two_tables_one_commit(spark, warehouse):
    cat = Catalog(warehouse)
    _setup(spark, cat)
    log_before = len(cat.log())
    out = cat.append_many(
        {"ta": _df(spark, 0, 10), "tb": _df(spark, 0, 5, "y")}
    )
    assert set(out) == {"ta", "tb"}
    assert len(cat.log()) == log_before + 1  # ONE commit for both
    assert cat.read(spark, "ta").count() == 10
    assert cat.read(spark, "tb").count() == 5
    # the commit's tables map updated both metadata pointers together
    head = cat.log()[0]
    assert "ta" in head["message"] and "tb" in head["message"]


def test_no_intermediate_state_in_history(spark, warehouse):
    """Every commit in history shows the two tables moving together:
    there is no commit where ta advanced but tb did not."""
    cat = Catalog(warehouse)
    _setup(spark, cat)
    for i in range(3):
        cat.append_many(
            {"ta": _df(spark, i * 10, i * 10 + 10),
             "tb": _df(spark, i * 5, i * 5 + 5)}
        )
    counts = []
    for c in cat.log():
        if c["id"] == "root":
            continue
        tables = c["tables"]
        if "ta" not in tables or "tb" not in tables:
            continue  # creation commits
        a = cat._load_table_at("ta", c["id"]).row_count()
        b = cat._load_table_at("tb", c["id"]).row_count()
        counts.append((a, b))
    assert (30, 15) in counts and (0, 0) in counts
    for a, b in counts:
        assert a == 2 * b  # locked ratio at every observable commit


def test_concurrent_equals_sequential(spark, warehouse):
    cat = Catalog(warehouse)
    _setup(spark, cat, ("c1", "c2", "c3"))
    _setup(spark, cat, ("s1", "s2", "s3"))
    dfs = [_df(spark, 0, 100, f"n{i}") for i in range(3)]
    cat.append_many(
        [("c1", dfs[0]), ("c2", dfs[1]), ("c3", dfs[2])], concurrent=True
    )
    cat.append_many(
        [("s1", dfs[0]), ("s2", dfs[1]), ("s3", dfs[2])], concurrent=False
    )
    for c, s in (("c1", "s1"), ("c2", "s2"), ("c3", "s3")):
        got = {tuple(r) for r in cat.read(spark, c).collect()}
        want = {tuple(r) for r in cat.read(spark, s).collect()}
        assert got == want and len(got) == 100


def test_empty_entries_elided(spark, warehouse):
    cat = Catalog(warehouse)
    _setup(spark, cat)
    log_before = len(cat.log())
    cat.append_many({"ta": _df(spark, 0, 7), "tb": _df(spark, 0, 0)})
    assert cat.read(spark, "ta").count() == 7
    assert cat.read(spark, "tb").count() == 0
    assert len(cat.log()) == log_before + 1
    # only ta in the commit message (tb elided)
    assert "tb" not in cat.log()[0]["message"]
    # all-empty: no commit at all
    cat.append_many({"ta": _df(spark, 0, 0), "tb": _df(spark, 0, 0)})
    assert len(cat.log()) == log_before + 1


def test_repeated_table_chains_snapshots(spark, warehouse):
    cat = Catalog(warehouse)
    _setup(spark, cat)
    log_before = len(cat.log())
    out = cat.append_many(
        [("ta", _df(spark, 0, 4)), ("ta", _df(spark, 4, 10))]
    )
    assert len(cat.log()) == log_before + 1
    assert cat.read(spark, "ta").count() == 10
    # two snapshots landed in the one commit, in order
    snaps = out["ta"].snapshots
    assert len(snaps) == 2
    assert snaps[0].summary["added-rows"] == 4
    assert snaps[1].summary["added-rows"] == 6


def test_expected_head_pins_cas(spark, warehouse):
    """read-check-publish: a commit landing after the caller captured
    the head MUST fail the pinned publish, even though an unpinned
    retry would have succeeded."""
    cat = Catalog(warehouse)
    _setup(spark, cat)
    head = cat._read_refs()["main"]
    cat.append(_df(spark, 100, 101, "rival"), "ta")  # head moves
    with pytest.raises(CommitConflict):
        cat.append_many(
            {"ta": _df(spark, 0, 5), "tb": _df(spark, 0, 5)},
            expected_head=head,
        )
    # nothing landed from the failed publish
    assert cat.read(spark, "ta").count() == 1
    assert cat.read(spark, "tb").count() == 0


def test_unpinned_retry_absorbs_conflicts(spark, warehouse):
    """Default mode: racing single-table appends against a multi-table
    append from real threads — all rows from all writers land."""
    cat = Catalog(warehouse)
    _setup(spark, cat)
    errors = []

    def rival():
        try:
            for i in range(3):
                cat.append(_df(spark, 1000 + i, 1001 + i, "rival"), "ta")
        except Exception as e:  # pragma: no cover
            errors.append(e)

    t = threading.Thread(target=rival)
    t.start()
    try:
        for i in range(3):
            cat.append_many(
                {"ta": _df(spark, i * 10, i * 10 + 10),
                 "tb": _df(spark, i * 10, i * 10 + 10, "b")},
                max_retries=8,
            )
    finally:
        t.join()
    assert errors == []
    ta = cat.read(spark, "ta")
    assert ta.count() == 33
    assert ta.filter("name = 'rival'").count() == 3
    assert cat.read(spark, "tb").count() == 30


def test_missing_table_raises_before_any_write(spark, warehouse):
    cat = Catalog(warehouse)
    _setup(spark, cat, ("ta",))
    log_before = len(cat.log())
    with pytest.raises(KeyError):
        cat.append_many({"ta": _df(spark, 0, 5), "nope": _df(spark, 0, 5)})
    assert cat.read(spark, "ta").count() == 0
    assert len(cat.log()) == log_before


def test_transaction_commits_on_clean_exit(spark, warehouse):
    cat = Catalog(warehouse)
    _setup(spark, cat)
    log_before = len(cat.log())
    with cat.transaction() as tx:
        tx.append(_df(spark, 0, 6), "ta")
        tx.append(_df(spark, 0, 3, "y"), "tb")
        # nothing visible before exit
        assert cat.read(spark, "ta").count() == 0
    assert cat.read(spark, "ta").count() == 6
    assert cat.read(spark, "tb").count() == 3
    assert len(cat.log()) == log_before + 1


def test_transaction_abandoned_on_exception(spark, warehouse):
    cat = Catalog(warehouse)
    _setup(spark, cat)
    log_before = len(cat.log())
    with pytest.raises(RuntimeError, match="boom"):
        with cat.transaction() as tx:
            tx.append(_df(spark, 0, 6), "ta")
            raise RuntimeError("boom")
    assert cat.read(spark, "ta").count() == 0
    assert len(cat.log()) == log_before


def test_transaction_explicit_commit_once(spark, warehouse):
    cat = Catalog(warehouse)
    _setup(spark, cat)
    with cat.transaction() as tx:
        tx.append(_df(spark, 0, 2), "ta")
        tx.commit()
        with pytest.raises(RuntimeError, match="already committed"):
            tx.append(_df(spark, 2, 4), "ta")
    # clean exit after explicit commit is a no-op
    assert cat.read(spark, "ta").count() == 2


def test_respects_sort_layout_per_table(spark, warehouse):
    """Each table's files are written under ITS layout (sort/partition
    derive from per-table metadata, not a shared writer)."""
    cat = Catalog(warehouse)
    schema = _df(spark, 0, 1).schema
    cat.create_table("plain", schema)
    cat.create_table("sorted_t", schema, sort_by=["id"])
    cat.append_many(
        {"plain": _df(spark, 0, 50), "sorted_t": _df(spark, 0, 50)}
    )
    m = cat.load_table("sorted_t")
    files = m.files()
    # range-partitioned sorted write: disjoint [min,max] id ranges
    spans = sorted(
        (f.columns["id"]["min"], f.columns["id"]["max"]) for f in files
    )
    for (lo1, hi1), (lo2, _hi2) in zip(spans, spans[1:]):
        assert hi1 < lo2
    assert cat.read(spark, "sorted_t").count() == 50


def test_transaction_failed_commit_is_not_retried_on_exit(spark, warehouse):
    """A caller that catches an explicit commit()'s conflict inside
    the with-block has seen the transaction FAIL — the clean-exit
    hook must not silently publish the 'abandoned' appends."""
    cat = Catalog(warehouse)
    _setup(spark, cat)
    head = cat._read_refs()["main"]
    with cat.transaction() as tx:
        tx.append(_df(spark, 0, 5), "ta")
        cat.append(_df(spark, 100, 101, "rival"), "ta")  # head moves
        # force the explicit commit to fail: pin the stale head
        try:
            tx._result = cat.append_many(
                tx._entries, "main", expected_head=head
            )
        except CommitConflict:
            pass
        finally:
            tx._attempted = True  # what commit() records internally
    # the block exited cleanly, but nothing further was published
    assert cat.read(spark, "ta").count() == 1  # only the rival row


def test_transaction_commit_failure_via_commit_method(spark, warehouse):
    """Same contract through the public surface: commit() that raises
    marks the transaction spent — exit does not re-run it, and
    further appends/commits are refused."""
    cat = Catalog(warehouse)
    _setup(spark, cat)
    original = Catalog.append_many

    def boom(self, *a, **k):
        raise CommitConflict("forced")

    with pytest.raises(RuntimeError, match="already committed"):
        with cat.transaction() as tx:
            tx.append(_df(spark, 0, 5), "ta")
            Catalog.append_many = boom
            try:
                with pytest.raises(CommitConflict):
                    tx.commit()
            finally:
                Catalog.append_many = original
            tx.commit()  # spent: must refuse, not re-run
    assert cat.read(spark, "ta").count() == 0


def test_unpinned_first_attempt_tolerates_commit_during_writes(
    spark, warehouse, monkeypatch
):
    """Unpinned append_many with max_retries=0: a commit landing
    DURING the file writes must not fail the publish — the CAS base
    is read after the writes, like every other mutator."""
    cat = Catalog(warehouse)
    _setup(spark, cat)
    orig_write = Catalog._write_files
    fired = {"done": False}

    def write_and_race(self, df, meta, table, **kw):
        files = orig_write(self, df, meta, table, **kw)
        if not fired["done"]:
            fired["done"] = True
            cat.append(_df(spark, 100, 103, "mid"), "ta")
        return files

    monkeypatch.setattr(Catalog, "_write_files", write_and_race)
    cat.append_many(
        {"ta": _df(spark, 0, 5), "tb": _df(spark, 0, 5)},
        max_retries=0,
        concurrent=False,
    )
    assert cat.read(spark, "ta").count() == 8  # 5 + 3 mid-write rows
    assert cat.read(spark, "tb").count() == 5


def test_tag_target_fails_before_any_write(spark, warehouse, monkeypatch):
    cat = Catalog(warehouse)
    _setup(spark, cat)
    cat.create_tag("pinned")
    wrote = []
    orig_write = Catalog._write_files
    monkeypatch.setattr(
        Catalog,
        "_write_files",
        lambda self, *a, **k: wrote.append(1) or orig_write(self, *a, **k),
    )
    with pytest.raises(ValueError, match="immutable tag"):
        cat.append_many({"ta": _df(spark, 0, 5)}, branch="pinned")
    assert wrote == []  # failed fast, zero orphaned files


def test_append_many_refuses_view_shadow(spark, warehouse):
    """The view-shadow guard lives in the shared commit path, so even
    the NEW multi-table surface rejects a table name a view holds."""
    cat = Catalog(warehouse)
    _setup(spark, cat)
    cat.sql(spark, "CREATE VIEW v_shadow AS SELECT * FROM ta")
    cat.create_table("v_shadow2", _df(spark, 0, 1).schema)
    # committing a table under a view's name must fail atomically:
    # direct _commit_tables with a would-be new table named v_shadow
    meta = cat.load_table("ta")
    bad = TableMetadata(
        table="v_shadow",
        schema_json=meta.schema_json,
        version=1,
    )
    head = cat._read_refs()["main"]
    with pytest.raises(ValueError, match="view named"):
        cat._commit_tables("main", {"v_shadow": bad}, head, "x")


def test_merge_schema_evolves_in_same_commit(spark, warehouse):
    """append(merge_schema=True) parity on the multi-table surface:
    each batch's extra columns join ITS table's schema in the same
    single commit as the rows; the other table is untouched."""
    cat = Catalog(warehouse)
    _setup(spark, cat)
    log_before = len(cat.log())
    wide = spark.range(5).select(
        "id", F.lit("x").alias("name"), F.lit(7).alias("extra")
    )
    cat.append_many(
        {"ta": wide, "tb": _df(spark, 0, 3)}, merge_schema=True
    )
    assert len(cat.log()) == log_before + 1
    ta = cat.read(spark, "ta")
    assert set(ta.columns) == {"id", "name", "extra"}
    assert ta.filter("extra = 7").count() == 5
    assert set(cat.read(spark, "tb").columns) == {"id", "name"}
    # without the flag, strict alignment DROPS a not-in-schema column
    wider = spark.range(2).select(
        "id",
        F.lit("y").alias("name"),
        F.lit(None).cast("int").alias("extra"),
        F.lit(9).alias("extra2"),
    )
    cat.append_many({"ta": wider}, merge_schema=False)
    out = cat.read(spark, "ta")
    assert "extra2" not in out.columns
    assert out.filter("name = 'y' AND extra IS NULL").count() == 2


def test_merge_schema_zero_row_batch_still_evolves(spark, warehouse):
    cat = Catalog(warehouse)
    _setup(spark, cat)
    empty_wide = spark.range(0).select(
        "id", F.lit("x").alias("name"), F.lit(1.5).alias("score")
    )
    cat.append_many(
        {"ta": empty_wide, "tb": _df(spark, 0, 2)}, merge_schema=True
    )
    assert "score" in cat.read(spark, "ta").columns
    assert cat.read(spark, "ta").count() == 0
    assert cat.read(spark, "tb").count() == 2


def test_transaction_merge_schema_passthrough(spark, warehouse):
    cat = Catalog(warehouse)
    _setup(spark, cat)
    wide = spark.range(4).select(
        "id", F.lit("x").alias("name"), F.lit("en").alias("lang")
    )
    with cat.transaction(merge_schema=True) as tx:
        tx.append(wide, "ta")
        tx.append(_df(spark, 0, 2), "tb")
    assert set(cat.read(spark, "ta").columns) == {"id", "name", "lang"}
    assert cat.read(spark, "ta").count() == 4


def test_pinned_all_elided_still_validates_head(spark, warehouse):
    """Read-check-publish with nothing to publish: an all-empty pinned
    append_many must still validate the pinned head — a caller whose
    batches happen to be empty asked the same question ("is my read
    still current?") and silent success would hide a stale probe
    (ADVICE r9)."""
    cat = Catalog(warehouse)
    _setup(spark, cat)
    empty = _df(spark, 0, 0)
    # quiescent branch: elided publish succeeds, commits nothing
    head = cat._read_refs()["main"]
    log_before = len(cat.log())
    out = cat.append_many(
        {"ta": empty, "tb": empty}, expected_head=head
    )
    assert set(out) == {"ta", "tb"}
    assert len(cat.log()) == log_before  # nothing committed
    # a rival commit after the pin: the elided publish must CONFLICT
    cat.append(_df(spark, 0, 3), "tb")
    with pytest.raises(CommitConflict, match="pinned head"):
        cat.append_many({"ta": empty, "tb": empty}, expected_head=head)
    # and nothing was committed by the failed attempt
    assert len(cat.log()) == log_before + 1


def test_threaded_merge_schema_evolution_never_lost(spark, warehouse):
    """Two writers race append_many(merge_schema=True) on the SAME
    table, each evolving a DIFFERENT new column: per-attempt
    re-derivation from the fresh head means the loser's retry sees the
    winner's evolution, so the final schema contains BOTH columns and
    neither writer's rows are lost (the merge_schema analogue of
    test_threaded_multi_table_appends_never_tear)."""
    cat = Catalog(warehouse)
    _setup(spark, cat, tables=("tm",))
    errors = []

    def work(tag: str, n: int):
        try:
            df = spark.range(n).select(
                "id",
                F.lit(tag).alias("name"),
                F.lit(1).alias(f"{tag}_col"),
            )
            cat.append_many(
                {"tm": df}, merge_schema=True, max_retries=16
            )
        except Exception as ex:  # pragma: no cover - failure detail
            errors.append((tag, ex))

    threads = [
        threading.Thread(target=work, args=("wa", 7)),
        threading.Thread(target=work, args=("wb", 5)),
    ]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    assert not errors, errors
    out = cat.read(spark, "tm")
    # no lost evolution: both new columns present
    assert set(out.columns) == {"id", "name", "wa_col", "wb_col"}
    # no lost rows; each writer's rows carry its column, NULL the other
    assert out.count() == 12
    assert out.filter("name = 'wa' AND wa_col = 1").count() == 7
    assert out.filter("name = 'wa' AND wb_col IS NULL").count() == 7
    assert out.filter("name = 'wb' AND wb_col = 1").count() == 5
    assert out.filter("name = 'wb' AND wa_col IS NULL").count() == 5


def test_aborted_transaction_debris_is_reclaimable(spark, warehouse, monkeypatch):
    """A transaction that dies AFTER its write wall (commit raises)
    leaves only unreferenced data files: catalog state is untouched,
    and remove_orphan_files reclaims every table's debris — the same
    recovery story as a lost single-table append (SCALE.md claim,
    VERDICT r9 #3)."""
    cat = Catalog(warehouse)
    _setup(spark, cat)
    cat.append_many({"ta": _df(spark, 0, 4), "tb": _df(spark, 0, 2)})
    log_before = len(cat.log())
    refs_before = cat._read_refs()

    def boom(self, *a, **k):
        raise RuntimeError("injected commit failure")

    monkeypatch.setattr(Catalog, "_commit_tables", boom)
    with pytest.raises(RuntimeError, match="injected"):
        with cat.transaction() as tx:
            tx.append(_df(spark, 100, 110), "ta")
            tx.append(_df(spark, 100, 140), "tb")
    monkeypatch.undo()

    # catalog state untouched: same head, same log, same counts
    assert cat._read_refs() == refs_before
    assert len(cat.log()) == log_before
    assert cat.read(spark, "ta").count() == 4
    assert cat.read(spark, "tb").count() == 2
    # BOTH tables' debris is on disk and visible to the dry-run sweep
    orphans_a = cat.remove_orphan_files("ta", dry_run=True, older_than_ms=0)
    orphans_b = cat.remove_orphan_files("tb", dry_run=True, older_than_ms=0)
    assert orphans_a and orphans_b
    # reclaim for real; a second sweep finds nothing, reads unharmed
    cat.remove_orphan_files("ta", dry_run=False, older_than_ms=0)
    cat.remove_orphan_files("tb", dry_run=False, older_than_ms=0)
    assert cat.remove_orphan_files("ta", dry_run=True, older_than_ms=0) == []
    assert cat.remove_orphan_files("tb", dry_run=True, older_than_ms=0) == []
    assert cat.read(spark, "ta").count() == 4
    assert cat.read(spark, "tb").count() == 2


def test_multi_failure_raises_lowest_index_with_notes(
    spark, warehouse, monkeypatch
):
    """When SEVERAL threaded table writes fail, the surfaced exception
    is the LOWEST entry index's (deterministic — not whichever thread
    happened to finish first) and the other failures ride along as
    exception notes instead of being silently discarded (ADVICE r10)."""
    cat = Catalog(warehouse)
    _setup(spark, cat, ("ta", "tb", "tc"))
    real = Catalog._write_files

    def flaky(self, df, proto, table, **kw):
        if table in ("tb", "tc"):
            raise ValueError(f"injected write failure on {table}")
        return real(self, df, proto, table, **kw)

    monkeypatch.setattr(Catalog, "_write_files", flaky)
    with pytest.raises(ValueError, match="on tb") as ei:
        cat.append_many(
            [
                ("ta", _df(spark, 0, 3)),
                ("tb", _df(spark, 0, 3)),
                ("tc", _df(spark, 0, 3)),
            ],
            concurrent=True,
        )
    notes = "".join(getattr(ei.value, "__notes__", []))
    assert "entry 2" in notes and "tc" in notes
    # nothing committed: the failed batch left no table moved
    assert cat.read(spark, "ta").count() == 0


def test_small_write_narrow_layout_matches_distributed(
    spark, warehouse, monkeypatch
):
    """``rows_hint`` at or below ``SMALL_WRITE_ROWS_MAX`` swaps the
    partition-clustering shuffle for a narrow single-task write. That
    must be an OPTIMIZATION, not a layout fork: same files-per-
    partition (exactly one per touched partition per append), same
    sorted row order within each file, bit-identical bloom filters —
    so every downstream probe/pruning decision is unchanged."""
    import pyarrow.parquet as pq
    import os

    import no_jvm_wap_with_iceberg_spark.catalog.table as table_mod

    rows = [(i * 37 % 1000, f"doc_{i}") for i in range(500)]

    def build(th: int, name: str):
        monkeypatch.setattr(table_mod, "SMALL_WRITE_ROWS_MAX", th)
        cat = Catalog(warehouse + f"/{name}")
        schema = spark.createDataFrame(rows, ["id", "name"]).schema
        cat.create_table(
            "t",
            schema,
            partition_by=["bucket(8, id)"],
            sort_by=["id"],
            bloom_cols=["id"],
        )
        cat.append_many(
            {"t": spark.createDataFrame(rows, schema)},
            rows_hint={"t": len(rows)},
        )
        meta = cat.load_table("t")
        per_part: dict = {}
        for f in meta.files():
            part = tuple(sorted(f.partition.items()))
            per_part.setdefault(part, []).append(f)
        # one file per touched partition, rows sorted by the sort key
        contents = {}
        for part, fs in per_part.items():
            assert len(fs) == 1, f"{name}: {len(fs)} files in {part}"
            tbl = pq.read_table(
                os.path.join(cat.warehouse, fs[0].path)
            )
            ids = tbl["id"].to_pylist()
            assert ids == sorted(ids)
            contents[part] = (
                sorted(zip(ids, tbl["name"].to_pylist())),
                fs[0].blooms.get("id"),
            )
        return contents

    narrow = build(1 << 30, "narrow")  # hint below threshold
    dist = build(0, "dist")  # threshold 0 -> distributed clustering
    assert narrow.keys() == dist.keys()
    for part in narrow:
        assert narrow[part][0] == dist[part][0]  # same rows per file
        assert narrow[part][1] == dist[part][1]  # bit-identical blooms
