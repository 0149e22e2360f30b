"""North-rule end-to-end: full changelog replay → final table state equals an
independent oracle, row-by-row by sha256(content); replay order-insensitive;
epoch-split replay converges to the single-shot state."""

from pyspark.sql import functions as F

from kafka_connect_plugins_spark.engine import apply_batch, create_repo_table, replay
from kafka_connect_plugins_spark.sources.changelog import changelog, expected_final_state

N_EVENTS = 4000


def _state_hashes(df):
    """{(repo,path): sha256(content)} — the BASELINE per-row invariant."""
    rows = df.select(
        "repo", "path", F.sha2(F.col("content"), 256).alias("h")
    ).collect()
    return {(r["repo"], r["path"]): r["h"] for r in rows}


def test_full_replay_matches_oracle(spark, tmp_path):
    events = changelog(spark, N_EVENTS, num_repos=10, paths_per_repo=40)
    table = create_repo_table(spark, str(tmp_path / "t1"), num_buckets=16)
    stats = replay(table, events, batches=1)
    assert stats[0].source_rows == N_EVENTS

    got = _state_hashes(table.read())
    want = _state_hashes(expected_final_state(events))
    assert got == want
    assert len(got) > 100  # sanity: a real mix of live keys survived


def test_epoch_split_replay_converges(spark, tmp_path):
    events = changelog(spark, N_EVENTS, num_repos=10, paths_per_repo=40)
    single = create_repo_table(spark, str(tmp_path / "single"), num_buckets=16)
    replay(single, events, batches=1)
    split = create_repo_table(spark, str(tmp_path / "split"), num_buckets=16)
    stats = replay(split, events, batches=8)
    assert sum(s.source_rows for s in stats) == N_EVENTS
    assert _state_hashes(single.read()) == _state_hashes(split.read())


def test_shuffled_replay_converges(spark, tmp_path):
    """Events arriving in arbitrary order within a batch produce the same state."""
    events = changelog(spark, 2000, num_repos=8, paths_per_repo=30)
    shuffled = events.orderBy(F.xxhash64("offset", F.lit(99)))  # deterministic scramble
    a = create_repo_table(spark, str(tmp_path / "a"), num_buckets=8)
    b = create_repo_table(spark, str(tmp_path / "b"), num_buckets=8)
    replay(a, events)
    replay(b, shuffled)
    assert _state_hashes(a.read()) == _state_hashes(b.read())


def test_replayed_microbatch_is_noop(spark, tmp_path):
    """Exactly-once: re-applying a committed epoch leaves the table untouched."""
    events = changelog(spark, 1000, num_repos=8, paths_per_repo=30)
    table = create_repo_table(spark, str(tmp_path / "t"), num_buckets=8)
    first = events.filter(F.col("offset") < 500)
    apply_batch(table, first, epoch_id=0, stream_id="s")
    state1 = _state_hashes(table.read())
    v1 = table.manifest()["version"]
    redo = apply_batch(table, first, epoch_id=0, stream_id="s")
    assert redo.skipped
    assert table.manifest()["version"] == v1
    assert _state_hashes(table.read()) == state1
    apply_batch(table, events.filter(F.col("offset") >= 500), epoch_id=1, stream_id="s")
    assert _state_hashes(table.read()) == _state_hashes(expected_final_state(events))


def test_skew_is_present_and_handled(spark, tmp_path):
    """The generator skews ~30% of events into repo 0; the merge still balances."""
    events = changelog(spark, 3000, num_repos=10, paths_per_repo=40, hot_fraction=0.3)
    by_repo = events.groupBy(F.col("value.repo")).count().collect()
    counts = {r[0]: r["count"] for r in by_repo}
    hot = counts.get("org/repo-0", 0)
    assert hot > 0.2 * 3000  # the skew actually exists
    table = create_repo_table(spark, str(tmp_path / "t"), num_buckets=8)
    replay(table, events)
    assert _state_hashes(table.read()) == _state_hashes(expected_final_state(events))
