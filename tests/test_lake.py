# -*- coding: utf-8 -*-
"""LakeTable: snapshot/merge/delete semantics + idempotent resume."""

from __future__ import annotations

import pytest

from knowledge_graph_spark.sources.lake import LakeTable


@pytest.fixture()
def tbl(tmp_path):
    return LakeTable(str(tmp_path), "t")


def rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_overwrite_and_read(spark, tbl):
    df = spark.createDataFrame([(1, "a"), (2, "b")], "k int, v string")
    tbl.overwrite(df)
    assert rows(tbl.read(spark)) == [(1, "a"), (2, "b")]


def test_merge_update_semantics(spark, tbl):
    tbl.overwrite(spark.createDataFrame([(1, "a"), (2, "b")], "k int, v string"))
    tbl.merge_into(
        spark.createDataFrame([(2, "B"), (3, "c")], "k int, v string"), on=["k"]
    )
    assert rows(tbl.read(spark)) == [(1, "a"), (2, "B"), (3, "c")]


def test_merge_ignore_semantics(spark, tbl):
    """ON CREATE only — matched rows keep their values (reference edge
    semantics, kg_writer.py:56-57)."""
    tbl.overwrite(spark.createDataFrame([(1, "a")], "k int, v string"))
    tbl.merge_into(
        spark.createDataFrame([(1, "X"), (2, "b")], "k int, v string"),
        on=["k"], when_matched="ignore",
    )
    assert rows(tbl.read(spark)) == [(1, "a"), (2, "b")]


def test_merge_idempotent_by_batch_id(spark, tbl):
    df = spark.createDataFrame([(1, "a")], "k int, v string")
    tbl.merge_into(df, on=["k"], batch_id="b1")
    r = tbl.merge_into(df, on=["k"], batch_id="b1")
    assert r.get("skipped")
    assert len(tbl.history()) == 1


def test_merge_reapply_same_batch_same_state(spark, tbl):
    """MERGE is a set operation: re-applying the same rows (new batch id)
    yields an identical table."""
    df = spark.createDataFrame([(1, "a"), (2, "b")], "k int, v string")
    tbl.merge_into(df, on=["k"], batch_id="b1")
    before = rows(tbl.read(spark))
    tbl.merge_into(df, on=["k"], batch_id="b2")
    assert rows(tbl.read(spark)) == before


def test_delete_where(spark, tbl):
    tbl.overwrite(spark.createDataFrame([(1, "a"), (2, "b")], "k int, v string"))
    tbl.delete_where(spark, "k = 1")
    assert rows(tbl.read(spark)) == [(2, "b")]


def test_lineage_and_counters(spark, tbl):
    tbl.overwrite(
        spark.createDataFrame([(1, "a")], "k int, v string"),
        counters={"stage": "unit"},
    )
    h = tbl.history()
    assert h[-1]["rows"] == 1
    assert h[-1]["counters"] == {"stage": "unit"}
    assert h[-1]["parent"] is None


def test_merge_commutative_on_disjoint_batches(spark, tmp_path):
    """SURVEY §5.2(4): applying disjoint batches in either order yields
    the identical table (insert-only merges commute)."""
    a = spark.createDataFrame([(1, "a"), (2, "b")], "k int, v string")
    b = spark.createDataFrame([(3, "c"), (4, "d")], "k int, v string")
    t1 = LakeTable(str(tmp_path), "ab")
    t1.merge_into(a, on=["k"]); t1.merge_into(b, on=["k"])
    t2 = LakeTable(str(tmp_path), "ba")
    t2.merge_into(b, on=["k"]); t2.merge_into(a, on=["k"])
    assert rows(t1.read(spark)) == rows(t2.read(spark))


def test_vacuum_keeps_current(spark, tbl):
    for i in range(4):
        tbl.overwrite(spark.createDataFrame([(i, "x")], "k int, v string"))
    removed = tbl.vacuum(keep_last=1)
    assert removed
    assert rows(tbl.read(spark)) == [(3, "x")]


def test_partitioned_merge_carries_untouched_partitions(spark, tbl):
    """Partition-scoped commit: a merge touching 1 of 3 partitions must
    carry the other 2 forward BY REFERENCE — same relative paths in the
    manifest, files untouched on disk."""
    import os

    df = spark.createDataFrame(
        [(i, f"g{i % 3}", "v0") for i in range(9)], "k int, g string, v string"
    )
    tbl.overwrite(df, partition_by=["g"])
    e0 = tbl.history()[-1]
    before = {k: list(v) for k, v in e0["partition_dirs"].items()}
    mtimes = {
        p: os.path.getmtime(os.path.join(tbl.dir, p)) for ps in before.values()
        for p in ps
    }

    upd = spark.createDataFrame([(0, "g0", "v1"), (99, "g0", "v1")],
                                "k int, g string, v string")
    tbl.merge_into(upd, on=["g", "k"], when_matched="update",
                   partition_by=["g"])
    e1 = tbl.history()[-1]
    dirs = e1["partition_dirs"]
    assert e1["carried_partitions"] == 2
    assert dirs["g1"] == before["g1"] and dirs["g2"] == before["g2"]
    assert dirs["g0"] != before["g0"]
    for p in dirs["g1"] + dirs["g2"]:
        assert os.path.getmtime(os.path.join(tbl.dir, p)) == mtimes[p]
    # row counts in the manifest track the merge
    assert e1["partition_rows"] == {"g0": 4, "g1": 3, "g2": 3}
    got = sorted(
        tuple(r) for r in tbl.read(spark).filter("g = 'g0'").collect()
    )
    assert got == [(0, "g0", "v1"), (3, "g0", "v0"), (6, "g0", "v0"),
                   (99, "g0", "v1")]


def test_partitioned_append_never_reads_current(spark, tbl):
    """Append on a partitioned table is a pure file add: old dirs stay
    referenced, new rows land in new dirs, totals accumulate."""
    a = spark.createDataFrame([(1, "g0"), (2, "g1")], "k int, g string")
    b = spark.createDataFrame([(3, "g0")], "k int, g string")
    tbl.append(a, partition_by=["g"])
    first = {k: list(v) for k, v in tbl.history()[-1]["partition_dirs"].items()}
    tbl.append(b, partition_by=["g"])
    e = tbl.history()[-1]
    assert e["partition_dirs"]["g1"] == first["g1"]
    assert len(e["partition_dirs"]["g0"]) == 2
    assert e["partition_rows"] == {"g0": 2, "g1": 1}
    assert e["rows"] == 3
    assert sorted(tuple(r) for r in tbl.read(spark).collect()) == [
        (1, "g0"), (2, "g1"), (3, "g0")
    ]


def test_partitioned_merge_subset_key_reaches_whole_group(spark, tbl):
    """Merge key narrower than the partition spec (refresh-one-graph on
    a (g, bucket) layout): every partition of that graph is replaced,
    other graphs' partitions carried."""
    df = spark.createDataFrame(
        [("g1", 0, "old"), ("g1", 1, "old"), ("g2", 0, "keep")],
        "g string, b int, v string",
    )
    tbl.overwrite(df, partition_by=["g", "b"])
    upd = spark.createDataFrame([("g1", 1, "new")], "g string, b int, v string")
    tbl.merge_into(upd, on=["g"], when_matched="update", dedupe=False,
                   partition_by=["g", "b"])
    got = sorted(tuple(r) for r in tbl.read(spark).collect())
    # g1's bucket-0 rows died with the graph refresh even though the
    # update only contained bucket-1 rows
    assert got == [("g1", 1, "new"), ("g2", 0, "keep")]
    assert tbl.history()[-1]["carried_partitions"] == 1


def test_partitioned_merge_delete_keys_clear_stale_rows(spark, tbl):
    """A re-crawled key that now produces ZERO rows still clears its old
    rows via delete_keys."""
    df = spark.createDataFrame([("u1", "g0", 1), ("u2", "g0", 2)],
                               "url string, g string, v int")
    tbl.overwrite(df, partition_by=["g"])
    empty = spark.createDataFrame([], "url string, g string, v int")
    keys = spark.createDataFrame([("u1", "g0")], "url string, g string")
    tbl.merge_into(empty, on=["url"], when_matched="update", dedupe=False,
                   partition_by=["g"], delete_keys=keys)
    assert [tuple(r) for r in tbl.read(spark).collect()] == [("u2", "g0", 2)]


def test_vacuum_preserves_carried_partition_donors(spark, tbl):
    """Snapshots still referenced by the current snapshot's carried
    partition_dirs must survive vacuum."""
    df = spark.createDataFrame(
        [(i, f"g{i % 3}") for i in range(6)], "k int, g string"
    )
    tbl.overwrite(df, partition_by=["g"])           # snap-1 (donor)
    for v in ("g0", "g1"):
        upd = spark.createDataFrame([(100, v)], "k int, g string")
        tbl.merge_into(upd, on=["g", "k"], partition_by=["g"])  # snaps 2..3
    removed = tbl.vacuum(keep_last=1)
    # snap-1 still holds g2's only copy -> must NOT be removed
    assert "snap-000001" not in removed
    assert tbl.read(spark).filter("g = 'g2'").count() == 2


def test_vacuum_reclaims_donor_after_last_reference_drops(spark, tbl):
    """A donor snapshot whose lineage entry was folded away must still be
    deleted once nothing references its directories anymore — removal
    walks the filesystem, not the (folded) lineage."""
    import os

    df = spark.createDataFrame(
        [(i, f"g{i % 3}") for i in range(6)], "k int, g string"
    )
    tbl.overwrite(df, partition_by=["g"])           # snap-1 (donor)
    upd = spark.createDataFrame([(100, "g0")], "k int, g string")
    tbl.merge_into(upd, on=["g", "k"], partition_by=["g"])  # snap-2 carries g1,g2
    tbl.vacuum(keep_last=1)                          # folds snap-1's entry; dir lives
    assert os.path.isdir(os.path.join(tbl.dir, "snap-000001"))
    # full overwrite: nothing references snap-1's directories anymore
    tbl.overwrite(df, partition_by=["g"])
    removed = tbl.vacuum(keep_last=1)
    assert "snap-000001" in removed
    assert not os.path.isdir(os.path.join(tbl.dir, "snap-000001"))
    assert tbl.read(spark).count() == 6


def test_merge_on_read_last_and_first_policies(spark, tbl):
    """MOR semantics: 'last' = update (newest seq wins), tombstones kill
    keys; commits never read the current snapshot (op = append)."""
    b0 = spark.createDataFrame([("u1", "g", 0, "a"), ("u2", "g", 0, "b")],
                               "url string, g string, b int, v string")
    tbl.merge_on_read(b0, on=["url"], seq=0, partition_by=["g"])
    b1 = spark.createDataFrame([("u1", "g", 0, "A")],
                               "url string, g string, b int, v string")
    dead = spark.createDataFrame([("u2", "g")], "url string, g string")
    tbl.merge_on_read(b1, on=["url"], seq=1, tombstone_keys=dead,
                      partition_by=["g"])
    got = sorted(tuple(r) for r in tbl.read(spark).collect())
    # u1 replaced by seq 1, u2 tombstoned
    assert got == [("u1", "g", 0, "A")]
    # both commits were appends: snapshot 1's dir is still referenced
    e = tbl.current_entry()
    assert e["op"] == "append"
    assert any(p.startswith("snap-000001/") for p in e["partition_dirs"]["g"])


def test_merge_on_read_first_policy_on_create(spark, tbl):
    a = spark.createDataFrame([(1, "g", "orig")], "k int, g string, v string")
    b = spark.createDataFrame([(1, "g", "clobber"), (2, "g", "new")],
                              "k int, g string, v string")
    tbl.merge_on_read(a, on=["k"], seq=0, policy="first", partition_by=["g"])
    tbl.merge_on_read(b, on=["k"], seq=1, policy="first", partition_by=["g"])
    got = sorted(tuple(r) for r in tbl.read(spark).collect())
    # k=1 keeps its FIRST-seen value (ON CREATE), k=2 inserts
    assert got == [(1, "g", "orig"), (2, "g", "new")]


def test_compact_folds_mor_history(spark, tbl):
    for s in range(4):
        df = spark.createDataFrame([(1, "g", f"v{s}"), (10 + s, "g", "x")],
                                   "k int, g string, v string")
        tbl.merge_on_read(df, on=["k"], seq=s, partition_by=["g"])
    before = sorted(tuple(r) for r in tbl.read(spark).collect())
    assert (1, "g", "v3") in before and len(before) == 5
    n_dirs_before = len(tbl.current_entry()["partition_dirs"]["g"])
    assert n_dirs_before == 4  # one appended dir per batch
    tbl.compact(spark)
    e = tbl.current_entry()
    assert len(e["partition_dirs"]["g"]) == 1  # folded
    assert e["mor"]  # still a MOR table
    assert sorted(tuple(r) for r in tbl.read(spark).collect()) == before
    # and further MOR batches apply on the compacted base
    tbl.merge_on_read(
        spark.createDataFrame([(1, "g", "v9")], "k int, g string, v string"),
        on=["k"], seq=9, partition_by=["g"])
    assert (1, "g", "v9") in {tuple(r) for r in tbl.read(spark).collect()}


def test_cow_and_mor_modes_do_not_mix(spark, tbl):
    import pytest as _pytest

    df = spark.createDataFrame([(1, "g", "a")], "k int, g string, v string")
    tbl.merge_on_read(df, on=["k"], seq=0, partition_by=["g"])
    with _pytest.raises(ValueError):
        tbl.merge_into(df, on=["k"], partition_by=["g"])
    with _pytest.raises(ValueError):
        tbl.append(df, partition_by=["g"])


def test_rollback_to_snapshot(spark, tbl):
    """Iceberg rollback: pure-metadata restore of an older snapshot;
    later writes keep allocating fresh snapshot ids (no dir collision)."""
    tbl.overwrite(spark.createDataFrame([(1, "v1")], "k int, v string"))
    tbl.overwrite(spark.createDataFrame([(1, "v2")], "k int, v string"))
    tbl.rollback("snap-000001")
    assert rows(tbl.read(spark)) == [(1, "v1")]
    tbl.overwrite(spark.createDataFrame([(1, "v3")], "k int, v string"))
    assert tbl.current_entry()["snapshot"] == "snap-000003"
    assert rows(tbl.read(spark)) == [(1, "v3")]
    # partitioned + carried refs survive a rollback too
    t2 = LakeTable(tbl.dir + "_p", "t")
    t2.overwrite(spark.createDataFrame([(1, "g0"), (2, "g1")], "k int, g string"),
                 partition_by=["g"])
    t2.merge_into(spark.createDataFrame([(9, "g0")], "k int, g string"),
                  on=["g", "k"], partition_by=["g"])
    t2.rollback("snap-000001")
    assert rows(t2.read(spark)) == [(1, "g0"), (2, "g1")]


def test_overwrite_partitions_replaces_wholesale(spark, tbl):
    """Dynamic partition overwrite: touched partitions replaced without
    reading their old rows; untouched carried by reference."""
    df = spark.createDataFrame(
        [("g1", 1, "old"), ("g1", 2, "old"), ("g2", 1, "keep")],
        "g string, k int, v string",
    )
    tbl.overwrite(df, partition_by=["g"])
    before_g2 = list(tbl.current_entry()["partition_dirs"]["g2"])
    new = spark.createDataFrame([("g1", 9, "new")], "g string, k int, v string")
    tbl.overwrite_partitions(new, partition_by=["g"], touched_keys=["g1"])
    got = sorted(tuple(r) for r in tbl.read(spark).collect())
    assert got == [("g1", 9, "new"), ("g2", 1, "keep")]
    e = tbl.current_entry()
    assert e["partition_dirs"]["g2"] == before_g2
    assert e["op"] == "overwrite_partitions"


def test_merge_on_read_commit_is_atomic(spark, tbl):
    """The MOR resolution spec must land in the SAME manifest commit as
    the lineage entry: a crash between two commits would leave the
    batch_id applied but the entry unresolvable (raw _seq/_tomb rows
    surfacing to readers)."""
    commits = []
    orig = tbl._commit
    tbl._commit = lambda m: (commits.append(1), orig(m))[1]
    df = spark.createDataFrame([(1, "g", "a")], "k int, g string, v string")
    tbl.merge_on_read(df, on=["k"], seq=0, partition_by=["g"])
    assert len(commits) == 1
    assert tbl.current_entry()["mor"] == {"key": ["k"], "policy": "last"}
    # same guarantee on the follow-up append path and on compact
    commits.clear()
    tbl.merge_on_read(
        spark.createDataFrame([(2, "g", "b")], "k int, g string, v string"),
        on=["k"], seq=1, partition_by=["g"])
    assert len(commits) == 1 and tbl.current_entry()["mor"]
    commits.clear()
    tbl.compact(spark)
    assert len(commits) == 1 and tbl.current_entry()["mor"]


def test_delete_where_prunes_partitions(spark, tbl):
    """A DELETE whose predicate constrains partition columns rewrites
    only matching partitions; the rest are carried by reference with
    files byte-untouched on disk."""
    import os

    df = spark.createDataFrame(
        [("g1", 1, "a"), ("g1", 2, "b"), ("g2", 3, "c"), ("g3", 4, "d")],
        "g string, k int, v string",
    )
    tbl.overwrite(df, partition_by=["g"])
    before = {k: list(v) for k, v in tbl.current_entry()["partition_dirs"].items()}
    mtimes = {
        p: os.path.getmtime(os.path.join(tbl.dir, p))
        for ps in before.values() for p in ps
    }
    tbl.delete_where(spark, "g = 'g1' AND k = 1")
    e = tbl.current_entry()
    # g2/g3 carried verbatim, g1 rewritten
    assert e["partition_dirs"]["g2"] == before["g2"]
    assert e["partition_dirs"]["g3"] == before["g3"]
    assert e["partition_dirs"]["g1"] != before["g1"]
    for p in before["g2"] + before["g3"]:
        assert os.path.getmtime(os.path.join(tbl.dir, p)) == mtimes[p]
    assert rows(tbl.read(spark)) == [("g1", 2, "b"), ("g2", 3, "c"),
                                     ("g3", 4, "d")]


def test_delete_where_data_column_falls_back(spark, tbl):
    """Predicate on a non-partition column cannot be scoped -> full
    rewrite, still correct."""
    df = spark.createDataFrame([("g1", 1, "x"), ("g2", 2, "y")],
                               "g string, k int, v string")
    tbl.overwrite(df, partition_by=["g"])
    tbl.delete_where(spark, "v = 'x'")
    assert rows(tbl.read(spark)) == [("g2", 2, "y")]


def test_delete_where_no_match_is_metadata_only(spark, tbl):
    """A partition-column predicate matching nothing commits pure
    metadata: every partition carried, batch_id recorded for resume."""
    df = spark.createDataFrame([("g1", 1, "x")], "g string, k int, v string")
    tbl.overwrite(df, partition_by=["g"])
    before = tbl.current_entry()["partition_dirs"]
    out = tbl.delete_where(spark, "g = 'nope'", batch_id="del1")
    assert out["partition_dirs"] == before
    assert out["carried_partitions"] == 1
    assert tbl.delete_where(spark, "g = 'nope'", batch_id="del1").get("skipped")
    assert rows(tbl.read(spark)) == [("g1", 1, "x")]


def test_vacuum_folds_lineage(spark, tbl):
    """A long stream of commits keeps an O(keep_last) manifest after
    vacuum; folded batch ids still dedupe replays (idempotent resume)."""
    for s in range(8):
        df = spark.createDataFrame([(s, "g", "v")], "k int, g string, v string")
        tbl.merge_on_read(df, on=["k"], seq=s, partition_by=["g"],
                          batch_id=f"b{s}")
    tbl.compact(spark)
    tbl.vacuum(keep_last=2)
    assert len(tbl.history()) <= 2
    # every folded batch id still recognized -> replay is a no-op
    for s in range(8):
        assert f"b{s}" in tbl.applied_batches()
        r = tbl.merge_on_read(
            spark.createDataFrame([(99, "g", "X")], "k int, g string, v string"),
            on=["k"], seq=s, partition_by=["g"], batch_id=f"b{s}")
        assert r.get("skipped")
    assert sorted(r[0] for r in tbl.read(spark).collect()) == list(range(8))


def test_time_travel_read(spark, tbl):
    """read(as_of=snapshot) reads a historical version byte-for-byte;
    unknown / vacuumed snapshots raise; MOR snapshots resolve the same
    way a current read would."""
    tbl.overwrite(spark.createDataFrame([(1, "a")], "k int, v string"))
    s1 = tbl.current_snapshot()
    tbl.merge_into(
        spark.createDataFrame([(1, "A"), (2, "b")], "k int, v string"),
        on=["k"])
    s2 = tbl.current_snapshot()
    tbl.merge_into(
        spark.createDataFrame([(3, "c")], "k int, v string"), on=["k"])

    assert rows(tbl.read(spark, as_of=s1)) == [(1, "a")]
    assert rows(tbl.read(spark, as_of=s2)) == [(1, "A"), (2, "b")]
    assert rows(tbl.read(spark)) == [(1, "A"), (2, "b"), (3, "c")]
    # time travel agrees with rollback (metadata-only on both paths)
    tbl.rollback(s2)
    assert rows(tbl.read(spark)) == rows(tbl.read(spark, as_of=s2))
    with pytest.raises(ValueError):
        tbl.read(spark, as_of="snap-does-not-exist")


def test_time_travel_read_mor(spark, tmp_path):
    """A historical merge-on-read snapshot resolves winners/tombstones
    at read time, exactly as it did when current."""
    t = LakeTable(str(tmp_path), "mor_t")
    t.merge_on_read(
        spark.createDataFrame([(1, "g", "a"), (2, "g", "b")],
                              "k int, g string, v string"),
        on=["k"], seq=0, partition_by=["g"])
    t.merge_on_read(
        spark.createDataFrame([(2, "g", "B"), (3, "g", "c")],
                              "k int, g string, v string"),
        on=["k"], seq=1, partition_by=["g"])
    s_mor = t.current_snapshot()
    t.merge_on_read(
        spark.createDataFrame([(4, "g", "d")], "k int, g string, v string"),
        on=["k"], seq=2, partition_by=["g"])
    assert rows(t.read(spark, as_of=s_mor)) == [
        (1, "g", "a"), (2, "g", "B"), (3, "g", "c")]


def test_read_changes_incremental_appends(spark, tbl):
    """Incremental scan returns exactly the rows each append window
    added (pure manifest diff), labeled _change_type='insert'; an
    empty window yields an empty frame with the table schema."""
    s1 = tbl.append(
        spark.createDataFrame([(1, "a"), (2, "b")], "k int, v string"),
        partition_by=["k"])["snapshot"]
    s2 = tbl.append(spark.createDataFrame([(3, "c")], "k int, v string"),
                    partition_by=["k"])["snapshot"]
    s3 = tbl.append(spark.createDataFrame([(4, "d")], "k int, v string"),
                    partition_by=["k"])["snapshot"]
    assert rows(tbl.read_changes(spark, s1)) == [
        (3, "c", "insert"), (4, "d", "insert")]
    assert rows(tbl.read_changes(spark, s1, s2)) == [(3, "c", "insert")]
    assert rows(tbl.read_changes(spark, s2, s3)) == [(4, "d", "insert")]
    empty = tbl.read_changes(spark, s3, s3)
    assert empty.count() == 0
    assert empty.columns == ["k", "v", "_change_type"]


def test_read_changes_mor_cdc(spark, tmp_path):
    """On a merge-on-read table the incremental scan is a CDC feed:
    updated keys surface as 'upsert', tombstoned keys as 'delete',
    and the raw _seq/_tomb bookkeeping never leaks to the consumer."""
    t = LakeTable(str(tmp_path), "mor")
    s1 = t.merge_on_read(
        spark.createDataFrame([(1, "a", 10), (2, "b", 10)],
                              "k int, v string, pk int"),
        on=["k"], seq=1, partition_by=["pk"])["snapshot"]
    s2 = t.merge_on_read(
        spark.createDataFrame([(2, "B", 10)], "k int, v string, pk int"),
        on=["k"], seq=2, partition_by=["pk"],
        tombstone_keys=spark.createDataFrame([(1, 10)], "k int, pk int"),
    )["snapshot"]
    got = rows(t.read_changes(spark, s1, s2))
    assert (2, "B", 10, "upsert") in got
    deletes = [r for r in got if r[-1] == "delete"]
    assert len(deletes) == 1 and deletes[0][0] == 1
    # the resolved table agrees with the changelog
    assert rows(t.read(spark)) == [(2, "B", 10)]


def test_read_changes_rejects_rewrites_and_vacuumed_base(spark, tbl):
    """A window crossing a compact (or any rewrite) must raise — the
    consumer has to re-baseline; so must a from_snapshot that vacuum
    already folded away."""
    s1 = tbl.append(spark.createDataFrame([(1, "a")], "k int, v string"),
                    partition_by=["k"])["snapshot"]
    tbl.append(spark.createDataFrame([(2, "b")], "k int, v string"),
               partition_by=["k"])
    tbl.compact(spark)
    with pytest.raises(ValueError, match="compact"):
        tbl.read_changes(spark, s1)
    with pytest.raises(ValueError, match="no readable lineage"):
        tbl.read_changes(spark, "snap-999999")


def test_schema_evolution_add_column(spark, tbl):
    """Iceberg add-column evolution: a later append may carry a new
    column — files written before it project NULL (schema-on-read via
    the manifest-pinned schema, no file rewrite); a batch missing an
    existing column lands as NULL for its rows."""
    tbl.append(spark.createDataFrame([(1, "a")], "k int, v string"),
               partition_by=["k"])
    tbl.append(spark.createDataFrame([(2, "b", 9.5)],
                                     "k int, v string, score double"),
               partition_by=["k"], evolve_schema=True)
    got = rows(tbl.read(spark))
    assert got == [(1, "a", None), (2, "b", 9.5)]
    # writer-side column drop: the table keeps the column, rows are NULL
    tbl.append(spark.createDataFrame([(3, 1.5)], "k int, score double"),
               partition_by=["k"])
    got = rows(tbl.read(spark))
    assert got == [(1, "a", None), (2, "b", 9.5), (3, None, 1.5)]
    # time travel sees the OLD schema (evolution is per-snapshot)
    first = tbl.history()[0]["snapshot"]
    assert tbl.read(spark, as_of=first).columns == ["k", "v"]


def test_schema_evolution_survives_merge_and_unpartitioned(spark, tbl):
    """Evolution composes with merge_into (partitioned carry + rewrite)
    and with unpartitioned appends (union with missing columns)."""
    tbl.append(spark.createDataFrame([(1, "a"), (2, "b")],
                                     "k int, v string"),
               partition_by=["k"])
    tbl.merge_into(
        spark.createDataFrame([(2, "B", "x")], "k int, v string, tag string"),
        on=["k"], partition_by=["k"], evolve_schema=True)
    assert rows(tbl.read(spark)) == [(1, "a", None), (2, "B", "x")]
    u = LakeTable(tbl.dir.rsplit("/", 1)[0], "u")
    u.append(spark.createDataFrame([(1, "a")], "k int, v string"))
    u.append(spark.createDataFrame([(2, 7)], "k int, n int"),
             evolve_schema=True)
    assert rows(u.read(spark)) == [(1, "a", None), (2, None, 7)]


def test_schema_evolution_is_opt_in_and_type_safe(spark, tbl):
    """A batch adding a column WITHOUT evolve_schema=True must error
    (a typo'd producer column must not silently fork a junk column and
    NULL the real one); a batch whose column type contradicts the
    pinned schema must error at write time (committing it would leave
    the table unreadable)."""
    tbl.append(spark.createDataFrame([(1, "a")], "k int, v string"),
               partition_by=["k"])
    with pytest.raises(ValueError, match="evolve_schema"):
        tbl.append(spark.createDataFrame([(2, "b", "oops")],
                                         "k int, v string, vlaue string"),
                   partition_by=["k"])
    with pytest.raises(ValueError, match="evolve_schema"):
        tbl.merge_into(spark.createDataFrame([(1, "A", 1)],
                                             "k int, v string, extra int"),
                       on=["k"], partition_by=["k"])
    with pytest.raises(ValueError, match="type"):
        tbl.append(spark.createDataFrame([(3, 7)], "k int, v int"),
                   partition_by=["k"])
    # the failed writes committed nothing
    assert rows(tbl.read(spark)) == [(1, "a")]


def test_read_changes_drives_incremental_consumer(spark, tmp_path):
    """The point of the CDC read: a downstream consumer folds each
    window's upserts/deletes into its own state and lands on exactly
    the full-recompute answer — incremental maintenance without ever
    rescanning the table."""
    t = LakeTable(str(tmp_path), "kv")
    snaps = []
    steps = [
        (spark.createDataFrame([(1, "a", 0), (2, "b", 0)],
                               "k int, v string, pk int"), None),
        (spark.createDataFrame([(3, "c", 1)], "k int, v string, pk int"),
         None),
        (spark.createDataFrame([(2, "B", 0)], "k int, v string, pk int"),
         spark.createDataFrame([(1, 0)], "k int, pk int")),
    ]
    for i, (upd, tomb) in enumerate(steps, start=1):
        snaps.append(t.merge_on_read(upd, on=["k"], seq=i,
                                     partition_by=["pk"],
                                     tombstone_keys=tomb)["snapshot"])
    state: dict = {}
    prev = snaps[0]
    # seed with the first snapshot's resolved content, then fold CDC
    for r in t.read(spark, as_of=prev).collect():
        state[r["k"]] = r["v"]
    for s in snaps[1:]:
        changes = t.read_changes(spark, prev, s).collect()
        # within one window, apply by ascending _seq order = snapshot
        # order here (one batch per window)
        for r in changes:
            if r["_change_type"] == "delete":
                state.pop(r["k"], None)
            else:
                state[r["k"]] = r["v"]
        prev = s
    full = {r["k"]: r["v"] for r in t.read(spark).collect()}
    assert state == full == {2: "B", 3: "c"}


def test_delete_where_fallback_keeps_partition_layout(spark, tbl):
    """A data-column DELETE that cannot prune must NOT de-partition the
    table: the rewritten snapshot keeps the recorded partition spec so
    partition-scoped reads and merges keep working."""
    tbl.append(spark.createDataFrame(
        [(1, "a", 0), (2, "b", 1)], "k int, v string, pk int"),
        partition_by=["pk"])
    tbl.delete_where(spark, "v = 'a'")
    entry = tbl.current_entry()
    assert entry.get("partition_spec") == ["pk"]
    assert rows(tbl.read_partitions(spark, ["1"])) == [(2, "b", 1)]
    assert rows(tbl.read(spark)) == [(2, "b", 1)]


def test_delete_where_rejects_mor_table(spark, tmp_path):
    """delete_where on a merge-on-read table must raise — a resolved
    rewrite would silently drop the mor spec and strand the stream."""
    t = LakeTable(str(tmp_path), "mor")
    t.merge_on_read(
        spark.createDataFrame([(1, "a", 0)], "k int, v string, pk int"),
        on=["k"], seq=1, partition_by=["pk"])
    with pytest.raises(ValueError, match="merge-on-read"):
        t.delete_where(spark, "v = 'a'")


def test_partition_spec_mismatch_is_loud(spark, tbl):
    """Writing with a different partition_by than the table's recorded
    spec (or none at all) must error — mixed key shapes corrupt the
    manifest's partition index and partition-scoped merges then miss
    partitions silently."""
    tbl.append(spark.createDataFrame(
        [(1, "a", 0)], "k int, v string, pk int"), partition_by=["pk"])
    df = spark.createDataFrame([(2, "b", 1)], "k int, v string, pk int")
    with pytest.raises(ValueError, match="partition spec"):
        tbl.append(df, partition_by=["pk", "k"])
    with pytest.raises(ValueError, match="partition spec"):
        tbl.append(df)
    with pytest.raises(ValueError, match="partition spec"):
        tbl.merge_into(df, on=["k"], partition_by=["k"])


# ---------------------------------------------------------------------------
# round-5 storage review regressions
# ---------------------------------------------------------------------------


def test_delete_where_null_tolerant_predicate_not_pruned(spark, tbl):
    """'v IS NOT NULL' evaluated FALSE on the NULL-substituted key
    frame, so every partition was pruned and the DELETE silently
    no-oped (r5 review finding). Null-tolerant predicates must take
    the full-rewrite path."""
    df = spark.createDataFrame(
        [("g1", 1, "x"), ("g2", 2, None)], "g string, k int, v string")
    tbl.overwrite(df, partition_by=["g"])
    tbl.delete_where(spark, "v IS NOT NULL")
    rows = tbl.read(spark).collect()
    assert len(rows) == 1 and rows[0]["v"] is None


def test_mor_tombstone_kills_first_policy_rows(spark, tbl):
    """Under policy='first' (ON CREATE tables) a later tombstone must
    still delete the key — the old resolution picked the min-seq
    winner before the tombstone filter, so deletes silently no-oped
    while read_changes emitted their CDC rows (r5 review finding)."""
    df = spark.createDataFrame([("g1", "k1", "v0")],
                               "g string, k string, v string")
    tbl.merge_on_read(df, on=["g", "k"], seq=0, policy="first",
                      partition_by=["g"])
    dead = spark.createDataFrame([("g1", "k1")], "g string, k string")
    empty = df.limit(0)
    tbl.merge_on_read(empty, on=["g", "k"], seq=1, policy="first",
                      tombstone_keys=dead, partition_by=["g"])
    assert tbl.read(spark).count() == 0
    # a write AFTER the tombstone re-creates the key (first-wins
    # among post-tombstone rows)
    df2 = spark.createDataFrame([("g1", "k1", "v2")],
                                "g string, k string, v string")
    tbl.merge_on_read(df2, on=["g", "k"], seq=2, policy="first",
                      partition_by=["g"])
    rows = tbl.read(spark).collect()
    assert len(rows) == 1 and rows[0]["v"] == "v2"


def test_mor_tombstone_missing_partition_column_raises(spark, tmp_path):
    from knowledge_graph_spark.sources.lake import LakeTable

    t = LakeTable(str(tmp_path), "tt")
    df = spark.createDataFrame([("g1", 3, "u1", "v")],
                               "g string, b int, u string, v string")
    t.merge_on_read(df, on=["g", "u"], seq=0, policy="last",
                    partition_by=["g", "b"])
    dead = spark.createDataFrame([("g1", "u1")], "g string, u string")
    with pytest.raises(ValueError):
        t.merge_on_read(df.limit(0), on=["g", "u"], seq=1,
                        policy="last", tombstone_keys=dead,
                        partition_by=["g", "b"])


def test_empty_string_partition_value_raises(spark, tbl):
    df = spark.createDataFrame([("", 1)], "g string, k int")
    with pytest.raises(ValueError):
        tbl.merge_into(df, on=["k"], partition_by=["g"])


def test_merge_into_validates_policy_before_first_commit(spark, tbl):
    df = spark.createDataFrame([(1, "a")], "k int, v string")
    with pytest.raises(ValueError):
        tbl.merge_into(df, on=["k"], when_matched="replace")
    assert not tbl.exists()      # nothing committed under the typo
