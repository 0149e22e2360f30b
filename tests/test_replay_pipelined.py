"""Pipelined replay (stats of epoch i+1 overlapped with write of epoch i):
same final state as the serial loop, overlap metrics recorded, epoch guard
still makes a resumed replay exactly-once."""

from pyspark.sql import functions as F

from kafka_connect_plugins_spark.engine import (
    apply_batch,
    create_repo_table,
    replay,
    replay_pipelined,
)
from kafka_connect_plugins_spark.sources.changelog import changelog

N_EVENTS = 4000


def _state_hashes(df):
    rows = df.select(
        "repo", "path", F.sha2(F.col("content"), 256).alias("h")
    ).collect()
    return {(r["repo"], r["path"]): r["h"] for r in rows}


def _batches(events, n, per):
    return [
        events.filter((F.col("offset") >= i * per) & (F.col("offset") < (i + 1) * per))
        for i in range(n)
    ]


def test_pipelined_replay_matches_serial(spark, tmp_path):
    events = changelog(spark, N_EVENTS, num_repos=10, paths_per_repo=40)
    serial = create_repo_table(spark, str(tmp_path / "serial"), num_buckets=16)
    replay(serial, events, batches=4)
    piped = create_repo_table(spark, str(tmp_path / "piped"), num_buckets=16)
    stats = replay_pipelined(piped, _batches(events, 4, N_EVENTS // 4))
    assert sum(s.source_rows for s in stats) == N_EVENTS
    assert _state_hashes(serial.read()) == _state_hashes(piped.read())
    # phase attribution: every epoch records its concurrent prep wall; from
    # the second epoch on, the overlap with the previous apply is measured
    assert all("prep_wall" in s.phases for s in stats)
    assert all("prep_overlap" in s.phases for s in stats[1:])
    assert all("__apply_window" not in s.phases for s in stats)


def test_pipelined_replay_resume_is_exactly_once(spark, tmp_path):
    events = changelog(spark, N_EVENTS, num_repos=10, paths_per_repo=40)
    t = create_repo_table(spark, str(tmp_path / "t"), num_buckets=16)
    per = N_EVENTS // 4
    # first run applies epochs 0-1; "crash"; rerun replays ALL epochs —
    # the manifest epoch guard must skip 0-1 and apply 2-3 exactly once
    replay_pipelined(t, _batches(events, 2, per), start_epoch=0)
    stats = replay_pipelined(t, _batches(events, 4, per), start_epoch=0)
    assert [s.skipped for s in stats] == [True, True, False, False]
    ref = create_repo_table(spark, str(tmp_path / "ref"), num_buckets=16)
    apply_batch(ref, events, epoch_id=0, stream_id="oneshot")
    assert _state_hashes(t.read()) == _state_hashes(ref.read())


def test_pipelined_replay_empty_and_single(spark, tmp_path):
    assert replay_pipelined(
        create_repo_table(spark, str(tmp_path / "e"), num_buckets=4), []
    ) == []
    events = changelog(spark, 500, num_repos=5, paths_per_repo=10)
    t = create_repo_table(spark, str(tmp_path / "s"), num_buckets=4)
    stats = replay_pipelined(t, [events])
    assert len(stats) == 1 and stats[0].source_rows == 500
