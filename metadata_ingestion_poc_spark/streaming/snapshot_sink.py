"""Exactly-once streaming sink onto the snapshot table format.

``foreachBatch`` delivers micro-batches at-least-once: after a crash
between the user function and the checkpoint commit, the same
(batch_id, data) is replayed. Writing each micro-batch through
``snapshot_write(..., batch_id=...)`` turns that into exactly-once
TABLE contents:

- replay after a crash BEFORE the manifest publish rewrites the same
  data files (same version-prefixed names) and publishes once;
- replay after publish finds the batch_id in a manifest and no-ops.

Every micro-batch is one snapshot version, so the table additionally
gets time travel per micro-batch, incremental reads between stream
positions (snapshot_changes), and pinned readers that never see a
half-written batch — none of which plain parquet-append foreachBatch
sinks provide. This is the same guarantee Delta's txn/version log
gives a streaming writer, on the repo's manifest format.

Scale note: one version per micro-batch means manifests grow with
stream lifetime; run snapshot_compact + snapshot_vacuum on a
maintenance cadence (compaction is itself a commit, so readers and
the replay check are never disrupted).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame

from ..snapshots import snapshot_write


def snapshot_sink(
    table_path: str, mode: str = "append"
) -> Callable[[DataFrame, int], None]:
    """foreachBatch handler committing each micro-batch as one
    idempotent snapshot version."""

    def handle(batch: DataFrame, batch_id: int) -> None:
        snapshot_write(batch, table_path, mode=mode, batch_id=batch_id)

    return handle
