"""Transaction-aligned batch replay: every snapshot is tx-consistent.

Each synthetic transaction upserts paths p0/p1/p2 with commit = its own tx
id, so any snapshot where the three paths disagree on commit proves a
transaction was split across epochs.
"""

from __future__ import annotations

import pytest

from kafka_connect_plugins_spark.engine import create_repo_table, replay_transactional


def _source(spark, n_events, tx_size):
    rows = []
    for lsn in range(1, n_events + 1):
        tx = f"tx{(lsn - 1) // tx_size}"
        rows.append(
            ("r", f"p{(lsn - 1) % 3}", tx, "py", f"content-{lsn}", lsn, False, tx)
        )
    return spark.createDataFrame(
        rows,
        "repo string, path string, commit string, lang string, "
        "content string, _lsn long, _tombstone boolean, _tx_id string",
    )


def _assert_tx_consistent(table, version):
    state = table.read(version=version).collect()
    if not state:
        return
    commits = {r["commit"] for r in state}
    assert len(commits) == 1, f"v{version}: split transaction visible: {commits}"
    assert len(state) == 3  # all three paths written together


def test_tx_aligned_epochs(spark, tmp_path):
    table = create_repo_table(spark, str(tmp_path / "t"), num_buckets=4)
    src = _source(spark, 12, tx_size=3)  # tx0..tx3, one per 3 LSNs
    stats = replay_transactional(table, src, events_per_epoch=4)
    # (0,4] ready tx0 | (3,7] ready tx1 | (6,10] ready tx2 | (9,13] flush tx3
    assert len(stats) == 4
    assert [s.source_rows for s in stats] == [3, 3, 3, 3]
    created = table._head_version() - len(stats)
    for v in range(created + 1, table._head_version() + 1):
        _assert_tx_consistent(table, v)
    final = {r["path"]: r["commit"] for r in table.read().collect()}
    assert final == {"p0": "tx3", "p1": "tx3", "p2": "tx3"}


def test_oversize_transaction_widens(spark, tmp_path):
    table = create_repo_table(spark, str(tmp_path / "t"), num_buckets=4)
    src = _source(spark, 9, tx_size=6)  # tx0 = lsn 1-6, tx1 = lsn 7-9
    stats = replay_transactional(table, src, events_per_epoch=2)
    # epoch0 widens 2->4->8 until tx0 fits; epoch1 flushes the tail tx1
    assert len(stats) == 2
    assert [s.source_rows for s in stats] == [6, 3]
    final = {r["path"]: r["commit"] for r in table.read().collect()}
    assert set(final.values()) == {"tx1"}


def test_flush_tail_false_holds_open_transaction(spark, tmp_path):
    table = create_repo_table(spark, str(tmp_path / "t"), num_buckets=4)
    src = _source(spark, 8, tx_size=3)  # tx2 has only lsn 7-8: mid-flight
    stats = replay_transactional(table, src, events_per_epoch=3, flush_tail=False)
    assert sum(s.source_rows for s in stats) == 6  # tx0 + tx1 only
    final = {r["path"]: r["commit"] for r in table.read().collect()}
    assert set(final.values()) == {"tx1"}


def test_rerun_is_idempotent(spark, tmp_path):
    table = create_repo_table(spark, str(tmp_path / "t"), num_buckets=4)
    src = _source(spark, 12, tx_size=3)
    replay_transactional(table, src, events_per_epoch=4)
    digest0 = sorted(map(tuple, table.read().collect()))
    again = replay_transactional(table, src, events_per_epoch=4)
    assert all(s.skipped for s in again)
    assert sorted(map(tuple, table.read().collect())) == digest0
