"""Continuously-maintained aggregate views over a streaming-ingested table.

Couples :class:`~kafka_connect_plugins_spark.plans.incremental_view.
IncrementalAggView` to the ingest loop: after each committed merge epoch the
view is advanced from the table's change feed (cost ∝ changed rows) and
re-materialized. The materialization is version-swapped like the lake table
itself — each refresh writes a new ``v{N}`` directory, then atomically
repoints a ``_CURRENT`` file — so readers never observe a half-written
view, and a crash between merge and refresh just replays the same
table-version delta (the refresh records which table version it reflects,
making it idempotent).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame

from kafka_connect_plugins_spark.plans.incremental_view import IncrementalAggView


class MaterializedView:
    """Versioned on-disk materialization of an :class:`IncrementalAggView`."""

    def __init__(self, view: IncrementalAggView, root: str):
        self.view = view
        self.root = root
        os.makedirs(root, exist_ok=True)

    # -- state ------------------------------------------------------------
    def _meta_path(self) -> str:
        return os.path.join(self.root, "_CURRENT")

    def meta(self) -> dict | None:
        try:
            with open(self._meta_path()) as f:
                return json.load(f)
        except FileNotFoundError:
            return None

    def table_version(self) -> int | None:
        m = self.meta()
        return None if m is None else int(m["table_version"])

    def read(self) -> DataFrame:
        m = self.meta()
        if m is None:
            raise ValueError(f"view at {self.root} was never refreshed")
        return self.view.table.spark.read.parquet(
            os.path.join(self.root, m["dir"])
        )

    # -- refresh ----------------------------------------------------------
    def refresh(self) -> dict:
        """Advance the materialization to the table's current version.

        Bootstrap (first call) recomputes from the table; afterwards only
        the change feed between the recorded and current table versions is
        read and folded in. A no-op when already current — safe to call
        unconditionally from a foreachBatch loop.
        """
        table = self.view.table
        v_now = int(table.manifest()["version"])
        m = self.meta()
        if m is not None and int(m["table_version"]) == v_now:
            return m
        if m is None:
            state = self.view.full(v_now)
        else:
            state = self.view.advance(self.read(), int(m["table_version"]), v_now)
        new_dir = f"v{v_now}"
        state.write.mode("overwrite").parquet(os.path.join(self.root, new_dir))
        meta = {"table_version": v_now, "dir": new_dir}
        tmp = self._meta_path() + ".tmp"
        with open(tmp, "w") as f:
            json.dump(meta, f)
        os.replace(tmp, self._meta_path())  # atomic repoint
        return meta

    def vacuum(self) -> list[str]:
        """Delete superseded view version dirs (everything but the one
        ``_CURRENT`` points at). Refresh never reads an old materialization
        after the repoint — ``advance`` folds from the CURRENT dir only —
        so unlike the lake table there is no time travel to preserve and no
        grace window needed: a reader that resolved ``_CURRENT`` before the
        swap may still be scanning the previous dir, so callers running
        beside live readers should delay vacuum by one refresh cycle.
        Returns the removed dir names."""
        import shutil

        m = self.meta()
        keep = m["dir"] if m else None
        removed = []
        for name in sorted(os.listdir(self.root)):
            if name.startswith("v") and name[1:].isdigit() and name != keep:
                shutil.rmtree(os.path.join(self.root, name))
                removed.append(name)
        return removed
