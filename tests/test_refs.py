"""Branch/tag refs and write-audit-publish over the versioned manifests.

Iceberg's branch-and-tag / WAP surface (public Iceberg docs: `branch`
snapshot refs, `cherrypick`-free fast-forward publish) re-expressed over
the LakeTable manifest chain: refs are named pointers in `_REFS.json`,
a branch-bound handle commits manifests that advance its ref instead of
`_CURRENT`, and publish is one atomic pointer swap guarded by ancestry.
"""

import pytest

from kafka_connect_plugins_spark.plans.lake_table import LakeTable


def _table(spark, tmp_path, name="tbl"):
    return LakeTable.create(
        spark, str(tmp_path / name), key_columns=["repo", "path"], num_buckets=4
    )


def _src(spark, rows):
    cols = ["repo", "path", "commit", "lang", "content", "_lsn", "_tombstone"]
    return spark.createDataFrame(
        [tuple(r.get(c) for c in cols) for r in rows],
        "repo string, path string, commit string, lang string, content string, "
        "_lsn long, _tombstone boolean",
    )


def _row(repo, path, content, lsn, dead=False):
    return {"repo": repo, "path": path, "commit": "c", "lang": "py",
            "content": content, "_lsn": lsn, "_tombstone": dead}


def _state(df):
    return {(r["repo"], r["path"]): r["content"] for r in df.collect()}


def test_tag_pins_a_snapshot(spark, tmp_path):
    t = _table(spark, tmp_path)
    t.merge(_src(spark, [_row("r", "a", "v1", 1)]))
    tagged = t.create_tag("rel-1")
    t.merge(_src(spark, [_row("r", "a", "v2", 2)]))
    assert _state(t.read()) == {("r", "a"): "v2"}
    assert _state(t.read(ref="rel-1")) == {("r", "a"): "v1"}
    assert _state(t.read(version=tagged)) == {("r", "a"): "v1"}
    with pytest.raises(ValueError):
        t.create_tag("rel-1")  # tags are immutable


def test_branch_writes_are_invisible_until_publish(spark, tmp_path):
    t = _table(spark, tmp_path)
    t.merge(_src(spark, [_row("r", "a", "base", 1)]), epoch_id=0)
    audit = t.create_branch("audit")
    audit.merge(_src(spark, [_row("r", "b", "staged", 2)]), epoch_id=1)
    # main readers see only the published snapshot
    assert _state(t.read()) == {("r", "a"): "base"}
    assert _state(t.read(ref="audit")) == {
        ("r", "a"): "base", ("r", "b"): "staged",
    }
    published = t.publish("audit")
    assert t._head_version("main") == published
    assert _state(t.read()) == {("r", "a"): "base", ("r", "b"): "staged"}
    # the branch ref was consumed by publish(drop=True)
    assert "audit" not in t.refs()["branches"]


def test_publish_carries_epoch_guard(spark, tmp_path):
    t = _table(spark, tmp_path)
    audit = t.create_branch("audit")
    audit.merge(_src(spark, [_row("r", "a", "x", 1)]), epoch_id=7)
    t.publish("audit")
    # replaying the staged epoch against MAIN is a no-op: exactly-once
    # survives the publish because epochs live inside the manifest
    stats = t.merge(_src(spark, [_row("r", "a", "dup", 1)]), epoch_id=7)
    assert stats.skipped
    assert _state(t.read()) == {("r", "a"): "x"}


def test_publish_refuses_diverged_main(spark, tmp_path):
    t = _table(spark, tmp_path)
    t.merge(_src(spark, [_row("r", "a", "v1", 1)]))
    audit = t.create_branch("audit")
    audit.merge(_src(spark, [_row("r", "b", "staged", 2)]))
    # a concurrent commit lands on main after the fork
    t.merge(_src(spark, [_row("r", "c", "hot", 3)]))
    with pytest.raises(ValueError, match="diverged"):
        t.publish("audit")
    # nothing moved
    assert _state(t.read()) == {("r", "a"): "v1", ("r", "c"): "hot"}


def test_checkout_and_drop(spark, tmp_path):
    t = _table(spark, tmp_path)
    t.create_branch("wip")
    again = t.checkout("wip")
    assert again.ref == "wip"
    t.drop_ref("wip")
    with pytest.raises(KeyError):
        t.checkout("wip")
    with pytest.raises(KeyError):
        t.drop_ref("wip")


def test_expire_retains_ref_heads(spark, tmp_path):
    t = _table(spark, tmp_path)
    t.merge(_src(spark, [_row("r", "a", "v1", 1)]))
    t.create_tag("pin")
    pinned_version = t._head_version("pin")
    for i in range(2, 6):
        t.merge(_src(spark, [_row("r", "a", f"v{i}", i)]))
    removed = t.expire_snapshots(keep_last=1)
    assert removed["data_versions_removed"] > 0
    # the tag still reads exactly its pinned content after aggressive GC
    assert _state(t.read(ref="pin")) == {("r", "a"): "v1"}
    assert _state(t.read(version=pinned_version)) == {("r", "a"): "v1"}
    assert _state(t.read()) == {("r", "a"): "v5"}


def test_branch_versions_do_not_collide_with_main(spark, tmp_path):
    t = _table(spark, tmp_path)
    t.merge(_src(spark, [_row("r", "a", "m1", 1)]))
    audit = t.create_branch("audit")
    audit.merge(_src(spark, [_row("r", "b", "b1", 2)]))
    t.merge(_src(spark, [_row("r", "c", "m2", 3)]))  # interleaved main commit
    audit.merge(_src(spark, [_row("r", "d", "b2", 4)]))
    # every snapshot remains readable at its own version: no file collisions
    assert _state(t.read()) == {("r", "a"): "m1", ("r", "c"): "m2"}
    assert _state(t.read(ref="audit")) == {
        ("r", "a"): "m1", ("r", "b"): "b1", ("r", "d"): "b2",
    }
