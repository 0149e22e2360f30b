"""Snapshot rollback (plans/lake_table.py — Iceberg rollback_to_snapshot
semantics: head moves FORWARD to a new commit equal to the target, history
stays readable, no data files rewritten, epoch ledger reverts)."""

import os
import subprocess
import sys

import pytest

from kafka_connect_plugins_spark.plans.lake_table import LakeTable

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _table(spark, tmp_path, buckets=4):
    return LakeTable.create(
        spark, str(tmp_path / "tbl"), key_columns=["repo", "path"], num_buckets=buckets
    )


COLS = ("repo string, path string, commit string, lang string, "
        "content string, _lsn long, _tombstone boolean")


def _batch(spark, rows):
    return spark.createDataFrame(
        [("r", p, "c", "py", v, lsn, False) for p, v, lsn in rows], COLS
    )


def _state(t, **kw):
    return {(r["repo"], r["path"]): r["content"] for r in t.read(**kw).collect()}


def _data_versions(root):
    return sorted(os.listdir(os.path.join(root, "data")))


def test_rollback_restores_state_and_keeps_history(spark, tmp_path):
    t = _table(spark, tmp_path)
    t.merge(_batch(spark, [("a", "A1", 1)]), epoch_id=1)
    v1 = t.manifest()["version"]
    t.merge(_batch(spark, [("a", "A2", 2), ("b", "B1", 3)]), epoch_id=2)
    v2 = t.manifest()["version"]
    before = _data_versions(t.root)
    v3 = t.rollback(v1)
    assert v3 > v2  # head moved FORWARD
    assert _data_versions(t.root) == before  # metadata-only
    assert _state(t) == {("r", "a"): "A1"}
    # the undone snapshot is still time-travel readable
    assert _state(t, version=v2) == {("r", "a"): "A2", ("r", "b"): "B1"}
    assert t.manifest()["parent"] == v2  # history is linear through the undo


def test_rollback_reverts_epoch_ledger_so_replay_reapplies(spark, tmp_path):
    t = _table(spark, tmp_path)
    e1 = _batch(spark, [("a", "A1", 1)])
    e2 = _batch(spark, [("a", "A2", 2)])
    t.merge(e1, epoch_id=1, stream_id="s")
    v1 = t.manifest()["version"]
    t.merge(e2, epoch_id=2, stream_id="s")
    assert t.last_epoch("s") == 2
    t.rollback(v1)
    # the ledger reverted with the state: epoch 2 is un-applied, so the
    # exactly-once guard lets the replay re-apply it instead of skipping
    assert t.last_epoch("s") == 1
    t.merge(e2, epoch_id=2, stream_id="s")
    assert _state(t) == {("r", "a"): "A2"}
    assert t.last_epoch("s") == 2


def test_rollback_to_head_is_a_noop(spark, tmp_path):
    t = _table(spark, tmp_path)
    t.merge(_batch(spark, [("a", "A1", 1)]))
    head = t.manifest()["version"]
    assert t.rollback(head) == head
    assert t.manifest()["version"] == head  # no empty commit


def test_rollback_refuses_non_ancestor(spark, tmp_path):
    t = _table(spark, tmp_path)
    t.merge(_batch(spark, [("a", "A1", 1)]), epoch_id=1)
    br = t.create_branch("stage")
    br.merge(_batch(spark, [("b", "B1", 2)]), epoch_id=2)
    staged = br.manifest()["version"]
    t.merge(_batch(spark, [("c", "C1", 3)]), epoch_id=3)  # main diverges
    with pytest.raises(ValueError, match="not an ancestor"):
        t.rollback(staged)


def test_rollback_across_rename_restores_old_names(spark, tmp_path):
    t = _table(spark, tmp_path)
    t.merge(_batch(spark, [("a", "A1", 1)]), epoch_id=1)
    v1 = t.manifest()["version"]
    t.rename_column("content", "body")
    assert "body" in t.read().columns
    t.rollback(v1)
    cols = t.read().columns
    assert "content" in cols and "body" not in cols
    assert _state(t) == {("r", "a"): "A1"}


def test_rollback_survives_snapshot_expiry(spark, tmp_path):
    t = _table(spark, tmp_path)
    t.merge(_batch(spark, [("a", "A1", 1)]), epoch_id=1)
    v1 = t.manifest()["version"]
    t.merge(_batch(spark, [("a", "A2", 2)]), epoch_id=2)
    t.rollback(v1)
    # keep only the rollback head: its referenced data files must survive
    t.expire_snapshots(keep_last=1)
    assert _state(t) == {("r", "a"): "A1"}


@pytest.mark.slow
def test_cli_rollback(spark, tmp_path):
    t = _table(spark, tmp_path)
    t.merge(_batch(spark, [("a", "A1", 1)]), epoch_id=1)
    v1 = t.manifest()["version"]
    t.merge(_batch(spark, [("a", "A2", 2)]), epoch_id=2)
    env = dict(os.environ, PYTHONPATH=REPO)
    proc = subprocess.run(
        [sys.executable, "-m", "kafka_connect_plugins_spark.main",
         "--table", str(tmp_path / "tbl"), "--rollback", str(v1),
         "--master", "local[2]"],
        capture_output=True, text=True, cwd=REPO, env=env, timeout=420,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert _state(t) == {("r", "a"): "A1"}
