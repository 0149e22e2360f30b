"""Stream-stream interval join + continuously-maintained views."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from kafka_connect_plugins_spark.streaming.joins import stream_stream_interval_join


def test_stream_stream_interval_join_matches_batch(spark, tmp_path):
    clicks_schema = "user_id long, ts timestamp, page string"
    buys_schema = "user_id long, ts timestamp, amount double"
    clicks = [
        Row(user_id=1, ts="2024-01-01 00:00:00", page="a"),
        Row(user_id=1, ts="2024-01-01 00:10:00", page="b"),
        Row(user_id=2, ts="2024-01-01 00:00:00", page="c"),
    ]
    buys = [
        Row(user_id=1, ts="2024-01-01 00:03:00", amount=5.0),   # joins click a only
        Row(user_id=1, ts="2024-01-01 00:12:00", amount=7.0),   # joins click b only
        Row(user_id=2, ts="2024-01-01 00:30:00", amount=9.0),   # outside window
    ]
    cdir, bdir = str(tmp_path / "clicks"), str(tmp_path / "buys")
    for path, rows, sch in ((cdir, clicks, clicks_schema), (bdir, buys, buys_schema)):
        df = spark.createDataFrame(rows).withColumn("ts", F.to_timestamp("ts"))
        df.write.mode("overwrite").parquet(path)

    lstream = spark.readStream.schema(clicks_schema).parquet(cdir)
    rstream = spark.readStream.schema(buys_schema).parquet(bdir)
    joined = stream_stream_interval_join(
        lstream,
        rstream,
        keys=["user_id"],
        left_time="ts",
        right_time="ts",
        watermark="1 hour",
        lower="0 seconds",
        upper="5 minutes",
    )
    q = (
        joined.writeStream.format("memory")
        .queryName("ssj_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert not q.isActive and q.exception() is None
    got = {
        (r.user_id, r.page, r.amount)
        for r in spark.sql("select * from ssj_out").collect()
    }
    assert got == {(1, "a", 5.0), (1, "b", 7.0)}
    # batch interval join agrees (same semantics, no state machinery)
    lb, rb = spark.read.parquet(cdir), spark.read.parquet(bdir).withColumnRenamed("ts", "bts")
    batch = lb.join(rb, "user_id").filter(
        (F.col("bts") >= F.col("ts")) & (F.col("bts") <= F.col("ts") + F.expr("interval 5 minutes"))
    )
    assert {(r.user_id, r.page, r.amount) for r in batch.collect()} == got


def test_stream_stream_join_rejects_bad_how(spark):
    df = spark.range(1).select(
        F.col("id").alias("k"), F.current_timestamp().alias("ts")
    )
    with pytest.raises(ValueError, match="join type"):
        stream_stream_interval_join(df, df, ["k"], "ts", "ts", how="fullOuter")


def test_materialized_view_refresh(spark, tmp_path):
    from kafka_connect_plugins_spark.plans.incremental_view import IncrementalAggView
    from kafka_connect_plugins_spark.plans.lake_table import LakeTable
    from kafka_connect_plugins_spark.streaming.view_refresh import MaterializedView

    t = LakeTable.create(
        spark, str(tmp_path / "t"), key_columns=["repo", "path"], num_buckets=4
    )

    def merge(rows, e):
        df = spark.createDataFrame(
            rows, "repo string, path string, lang string, size long, _lsn long, _tombstone boolean"
        )
        t.merge(df, lsn_col="_lsn", tombstone_col="_tombstone", epoch_id=e)

    view = MaterializedView(
        IncrementalAggView(t, ["lang"], {"total_size": F.col("size")}),
        str(tmp_path / "view"),
    )
    merge([Row(repo="r", path="a", lang="py", size=10, _lsn=1, _tombstone=False)], 0)
    m1 = view.refresh()  # bootstrap
    assert m1["table_version"] == t.manifest()["version"]
    assert {r.lang: r.total_size for r in view.read().collect()} == {"py": 10}

    merge([
        Row(repo="r", path="a", lang="py", size=25, _lsn=5, _tombstone=False),
        Row(repo="r", path="b", lang="go", size=3, _lsn=6, _tombstone=False),
    ], 1)
    view.refresh()  # incremental
    assert {r.lang: r.total_size for r in view.read().collect()} == {"py": 25, "go": 3}
    # idempotent no-op when already current
    before = view.meta()
    assert view.refresh() == before
    # matches recomputation
    full = {r.lang: r.total_size for r in view.view.full().collect()}
    assert {r.lang: r.total_size for r in view.read().collect()} == full


def test_materialized_view_read_before_refresh_raises(spark, tmp_path):
    from kafka_connect_plugins_spark.plans.incremental_view import IncrementalAggView
    from kafka_connect_plugins_spark.plans.lake_table import LakeTable
    from kafka_connect_plugins_spark.streaming.view_refresh import MaterializedView

    t = LakeTable.create(
        spark, str(tmp_path / "t"), key_columns=["repo", "path"], num_buckets=4
    )
    v = MaterializedView(
        IncrementalAggView(t, ["lang"], {"s": F.lit(1)}), str(tmp_path / "v")
    )
    with pytest.raises(ValueError, match="never refreshed"):
        v.read()


def test_streaming_ingest_maintains_view_live(spark, tmp_path):
    """A MaterializedView attached to StreamingIngest tracks every epoch."""
    from kafka_connect_plugins_spark.engine import create_repo_table
    from kafka_connect_plugins_spark.plans.incremental_view import IncrementalAggView
    from kafka_connect_plugins_spark.sources.changelog import changelog, expected_final_state
    from kafka_connect_plugins_spark.streaming import StreamingIngest
    from kafka_connect_plugins_spark.streaming.view_refresh import MaterializedView

    events = changelog(spark, 2000, num_repos=6, paths_per_repo=20)
    log_dir = str(tmp_path / "log")
    events.repartitionByRange(4, "offset").write.parquet(log_dir)

    table = create_repo_table(spark, str(tmp_path / "t"), num_buckets=8)
    view = MaterializedView(
        IncrementalAggView(table, ["repo"], {"bytes": F.length("content")}),
        str(tmp_path / "view"),
    )
    ingest = StreamingIngest(table, stream_id="s1", views=[view])
    stats = ingest.run_available(
        spark, log_dir, str(tmp_path / "ckpt"), max_files_per_trigger=1, timeout_sec=120
    )
    assert len(stats) >= 3  # several epochs, each refreshed the view
    assert view.table_version() == table.manifest()["version"]
    got = {r.repo: (r.bytes, r.n_rows) for r in view.read().collect()}
    want = {
        r.repo: (r.bytes, r.n_rows)
        for r in expected_final_state(events)
        .groupBy("repo")
        .agg(F.sum(F.length("content")).alias("bytes"), F.count(F.lit(1)).alias("n_rows"))
        .collect()
    }
    assert got == want


def test_materialized_view_vacuum_keeps_current_only(spark, tmp_path):
    import os

    from kafka_connect_plugins_spark.plans.incremental_view import IncrementalAggView
    from kafka_connect_plugins_spark.plans.lake_table import LakeTable
    from kafka_connect_plugins_spark.streaming.view_refresh import MaterializedView

    t = LakeTable.create(
        spark, str(tmp_path / "t"), key_columns=["repo", "path"], num_buckets=4
    )

    def merge(rows, e):
        df = spark.createDataFrame(
            rows, "repo string, path string, lang string, size long, _lsn long, _tombstone boolean"
        )
        t.merge(df, lsn_col="_lsn", tombstone_col="_tombstone", epoch_id=e)

    view = MaterializedView(
        IncrementalAggView(t, ["lang"], {"total_size": F.col("size")}),
        str(tmp_path / "view"),
    )
    merge([Row(repo="r", path="a", lang="py", size=10, _lsn=1, _tombstone=False)], 0)
    view.refresh()
    merge([Row(repo="r", path="b", lang="go", size=3, _lsn=2, _tombstone=False)], 1)
    view.refresh()
    dirs = [d for d in os.listdir(view.root) if d.startswith("v")]
    assert len(dirs) == 2  # two materializations on disk before vacuum
    removed = view.vacuum()
    assert len(removed) == 1 and removed[0] != view.meta()["dir"]
    # the live materialization still reads, and vacuum is idempotent
    assert {r.lang: r.total_size for r in view.read().collect()} == {"py": 10, "go": 3}
    assert view.vacuum() == []
