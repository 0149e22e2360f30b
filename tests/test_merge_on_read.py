"""Merge-on-read (deferred merge) semantics: delta append, read-time LWW
collapse, fold-on-rewrite, compact(), retention interplay."""

import os

from kafka_connect_plugins_spark.plans.lake_table import LakeTable

from tests.test_lake_table import _src, _state


def _mk(spark, tmp_path, name="mor", buckets=4):
    return LakeTable.create(
        spark, str(tmp_path / name), key_columns=["repo", "path"], num_buckets=buckets
    )


def _rows(spec):
    return [
        {"repo": r, "path": p, "commit": "c", "lang": "py", "content": c,
         "_lsn": lsn, "_tombstone": tomb}
        for (r, p, c, lsn, tomb) in spec
    ]


def test_defer_state_equals_rewrite_state(spark, tmp_path):
    b1 = _rows([("r", f"p{i}", f"v{i}", i, False) for i in range(8)])
    b2 = _rows([
        ("r", "p2", "updated", 100, False),
        ("r", "p3", "stale", 1, False),      # loses to lsn 3
        ("r", "p4", None, 101, True),        # delete
        ("r", "new", "fresh", 102, False),   # insert
    ])
    t_defer = _mk(spark, tmp_path, "defer")
    t_defer.merge(_src(spark, b1), mode="defer")
    t_defer.merge(_src(spark, b2), mode="defer")
    t_rw = _mk(spark, tmp_path, "rw")
    t_rw.merge(_src(spark, b1))
    t_rw.merge(_src(spark, b2))
    assert _state(t_defer) == _state(t_rw)
    assert _state(t_defer)[("r", "p2")] == ("updated", 100)
    assert _state(t_defer)[("r", "p3")] == ("v3", 3)
    assert ("r", "p4") not in _state(t_defer)
    # and the defer table really did defer: pending deltas in the manifest
    assert t_defer.manifest().get("deltas")
    assert not t_rw.manifest().get("deltas")


def test_rewrite_folds_pending_deltas(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.merge(_src(spark, _rows([("r", "p", "v1", 1, False)])), mode="defer")
    t.merge(_src(spark, _rows([("r", "p", "v2", 2, False)])), mode="defer")
    assert t.manifest()["deltas"]
    # rewrite-mode merge touching the same bucket folds its deltas
    t.merge(_src(spark, _rows([("r", "p", "v3", 3, False)])))
    assert not t.manifest().get("deltas")
    assert _state(t)[("r", "p")] == ("v3", 3)


def test_compact_folds_all_deltas(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.merge(_src(spark, _rows([("r", f"p{i}", f"v{i}", i, False) for i in range(6)])),
            mode="defer")
    t.merge(_src(spark, _rows([("r", "p1", "v1b", 50, False)])), mode="defer")
    assert t.manifest()["deltas"]
    n = t.compact()
    assert n >= 1
    assert not t.manifest().get("deltas")
    st = _state(t)
    assert st[("r", "p1")] == ("v1b", 50)
    assert st[("r", "p5")] == ("v5", 5)
    assert t.compact() == 0  # idempotent no-op


def test_defer_auto_folds_at_threshold(spark, tmp_path):
    t = LakeTable.create(
        spark, str(tmp_path / "auto"), key_columns=["repo", "path"], num_buckets=1
    )
    for i in range(6):
        t.merge(
            _src(spark, _rows([("r", "p", f"v{i}", i, False)])),
            mode="defer",
            compact_files_per_bucket=3,
        )
    # pending deltas never exceed the threshold: epoch 3 (and 6, ...) folded
    assert len(t.manifest().get("deltas", {}).get("0", [])) < 3 + 1
    assert _state(t)[("r", "p")] == ("v5", 5)


def test_time_travel_and_changes_across_defer(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.merge(_src(spark, _rows([("r", "p", "base", 1, False)])))
    v1 = t.manifest()["version"]
    t.merge(_src(spark, _rows([("r", "p", "delta", 2, False)])), mode="defer")
    v2 = t.manifest()["version"]
    # time travel to the pre-delta snapshot
    old = {(r["repo"], r["path"]): r["content"] for r in t.read(version=v1).collect()}
    assert old == {("r", "p"): "base"}
    # change feed across the deferred commit sees the update
    changes = t.read_changes(v1, v2).collect()
    assert any(
        r["path"] == "p" and r["_change_type"] == "update_postimage"
        and r["content"] == "delta"
        for r in changes
    )


def test_expire_keeps_live_delta_dirs(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.merge(_src(spark, _rows([("r", "p", "v1", 1, False)])))
    t.merge(_src(spark, _rows([("r", "p", "v2", 2, False)])), mode="defer")
    t.merge(_src(spark, _rows([("r", "q", "w1", 3, False)])), mode="defer")
    t.expire_snapshots(keep_last=1)
    # all still-referenced base + delta dirs survived: reads stay correct
    st = _state(t)
    assert st[("r", "p")] == ("v2", 2)
    assert st[("r", "q")] == ("w1", 3)


def test_purge_tombstones_folds_deltas(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.merge(_src(spark, _rows([("r", "p", "v1", 1, False), ("r", "q", "w", 2, False)])))
    t.merge(_src(spark, _rows([("r", "p", None, 5, True)])), mode="defer")
    assert ("r", "p") not in _state(t)
    n = t.purge_tombstones(below_lsn=10)
    assert n >= 1
    st = _state(t)
    assert ("r", "p") not in st and st[("r", "q")] == ("w", 2)
    # the purged bucket's pending deltas were folded into its new base
    assert not t.manifest().get("deltas")
    # reads remain consistent after a further merge
    t.merge(_src(spark, _rows([("r", "p", "back", 20, False)])))
    assert _state(t)[("r", "p")] == ("back", 20)
