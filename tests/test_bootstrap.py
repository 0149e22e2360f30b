"""Snapshot-then-stream bootstrap (the Debezium initial-snapshot pattern).

A CDC pipeline over an existing source can't replay a log that's been
compacted away; it loads one consistent snapshot at log position L, then
tails events with lsn > L. The invariant: bootstrap(snapshot@L) + tail
replay == full-log replay, row-by-row by sha256(content) — the BASELINE
per-row invariant applied to the hybrid start-up path.
"""

import pytest
from pyspark.sql import functions as F

from kafka_connect_plugins_spark.engine import create_repo_table, replay
from kafka_connect_plugins_spark.sources.changelog import changelog

N_EVENTS = 3000
SPLIT = 1800  # snapshot position L


def _state_hashes(df):
    rows = df.select(
        "repo", "path", F.sha2(F.col("content"), 256).alias("h")
    ).collect()
    return {(r["repo"], r["path"]): r["h"] for r in rows}


@pytest.fixture()
def events(spark):
    return changelog(spark, N_EVENTS, num_repos=8, paths_per_repo=30)


def test_bootstrap_plus_tail_equals_full_replay(spark, tmp_path, events):
    # full-log replay: the ground truth
    full = create_repo_table(spark, str(tmp_path / "full"), num_buckets=8)
    replay(full, events)

    # a consistent snapshot at L = the table state after events with lsn <= L
    snap_src = create_repo_table(spark, str(tmp_path / "snapsrc"), num_buckets=8)
    replay(snap_src, events.filter(F.col("offset") <= SPLIT))
    snapshot = snap_src.read()  # keys + payload + per-row _lsn

    # bootstrap + tail
    hybrid = create_repo_table(spark, str(tmp_path / "hybrid"), num_buckets=8)
    stats = hybrid.bootstrap(snapshot, snapshot_lsn=SPLIT)
    assert not stats.skipped and stats.source_rows > 0
    # the tail is its own stream: epoch guards are per-stream, and the
    # bootstrap epoch (stream "default", epoch 0) already committed
    replay(hybrid, events.filter(F.col("offset") > SPLIT))
    assert _state_hashes(hybrid.read()) == _state_hashes(full.read())


def test_bootstrap_without_lsn_column_stamps_snapshot_lsn(spark, tmp_path):
    t = create_repo_table(spark, str(tmp_path / "t"), num_buckets=4)
    snap = spark.createDataFrame(
        [("r", "a", "c1", "py", "hello")],
        "repo string, path string, commit string, lang string, content string",
    )
    t.bootstrap(snap, snapshot_lsn=500)
    row = t.read().collect()[0]
    assert row["_lsn"] == 500
    # a stale tail event below the snapshot position must lose
    from kafka_connect_plugins_spark.plans.lake_table import LakeTable  # noqa: F401

    stale = spark.createDataFrame(
        [("r", "a", "c0", "py", "old", 400, False)],
        "repo string, path string, commit string, lang string, content string, "
        "_lsn long, _tombstone boolean",
    )
    t.merge(stale, epoch_id=1)
    assert t.read().collect()[0]["content"] == "hello"


def test_bootstrap_is_idempotent_under_epoch_guard(spark, tmp_path):
    t = create_repo_table(spark, str(tmp_path / "t"), num_buckets=4)
    snap = spark.createDataFrame(
        [("r", "a", "c1", "py", "x")],
        "repo string, path string, commit string, lang string, content string",
    )
    t.bootstrap(snap, snapshot_lsn=10)
    v = t.manifest()["version"]
    # restart-after-crash: the table is no longer empty, but the epoch
    # guard (not the emptiness check) must make the redo a no-op
    redo = t.merge(
        snap.withColumn("_lsn", F.lit(10).cast("long"))
        .withColumn("_tombstone", F.lit(False)),
        epoch_id=0,
    )
    assert redo.skipped
    assert t.manifest()["version"] == v


def test_bootstrap_refuses_nonempty_table(spark, tmp_path):
    t = create_repo_table(spark, str(tmp_path / "t"), num_buckets=4)
    snap = spark.createDataFrame(
        [("r", "a", "c1", "py", "x")],
        "repo string, path string, commit string, lang string, content string",
    )
    t.bootstrap(snap)
    with pytest.raises(ValueError, match="empty"):
        t.bootstrap(snap)
