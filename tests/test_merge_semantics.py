"""Differential test: parquet-fallback upsert ≡ Delta MERGE semantics.

delta-spark isn't installable here, so the real `DeltaTable.merge`
path (writer.py:_write_hub_delta) can't execute. This file pins the
fallback (`_write_hub_parquet_merge`) against an executable MODEL of
MERGE ... WHEN MATCHED UPDATE ALL / WHEN NOT MATCHED INSERT ALL with
schema autoMerge — the same contract the Delta path configures — so
any drift in the fallback's keyless / composite-key / schema-evolution
corners shows up as a model mismatch, not a silent divergence between
the two writer branches.

Model: dict[key_tuple -> row]; a batch updates matched keys and
inserts unmatched ones; autoMerge unions schemas (absent cells null).
Keyless tables degenerate to append (merge condition would be false:
every source row inserts) — the reference's edge case
(/root/reference writer.py:19-30).
"""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from metadata_ingestion_poc_spark.writer import (
    _write_hub_parquet_merge,
    read_hub,
)


def _merge_model(state: dict, cols: list, batch: list[dict], keys: list[str]):
    """Reference semantics of Delta MERGE upsert-all with autoMerge."""
    for row in batch:
        for c in row:
            if c not in cols:
                cols.append(c)
    if not keys:
        # keyless: condition literal-false -> all rows insert (append)
        n = len(state)
        for i, row in enumerate(batch):
            state[("__append__", n + i)] = dict(row)
        return
    for row in batch:
        state[tuple(row[k] for k in keys)] = dict(row)


def _table_state(spark, path, keys):
    rows = [r.asDict() for r in read_hub(spark, path).collect()]
    if not keys:
        return sorted(
            (tuple(sorted((k, v) for k, v in r.items() if v is not None)))
            for r in rows
        )
    return {tuple(r[k] for k in keys): r for r in rows}


def _model_state(state, cols, keys):
    if not keys:
        return sorted(
            tuple(sorted((k, v) for k, v in r.items() if v is not None))
            for r in state.values()
        )
    # widen every model row to the full evolved schema with nulls
    return {k: {c: r.get(c) for c in cols} for k, r in state.items()}


def _apply_both(spark, path, state, cols, batches, keys):
    for batch in batches:
        df = spark.createDataFrame([Row(**r) for r in batch])
        _write_hub_parquet_merge(spark, df, str(path), keys)
        _merge_model(state, cols, batch, keys)
        got = _table_state(spark, str(path), keys)
        want = _model_state(state, cols, keys)
        assert got == want, f"diverged after batch {batch}"


def test_fallback_matches_merge_model_simple_key(spark, tmp_path):
    batches = [
        [{"pk": 1, "v": "a"}, {"pk": 2, "v": "b"}],
        [{"pk": 2, "v": "B"}, {"pk": 3, "v": "c"}],  # update + insert
        [{"pk": 1, "v": "A2"}],                       # update only
    ]
    _apply_both(spark, tmp_path / "t1", {}, [], batches, ["pk"])


def test_fallback_matches_merge_model_composite_key(spark, tmp_path):
    batches = [
        [{"d": "x", "e": 1, "v": 10}, {"d": "x", "e": 2, "v": 20}],
        # same d, new e -> insert; same (d,e) -> update
        [{"d": "x", "e": 1, "v": 11}, {"d": "y", "e": 1, "v": 30}],
    ]
    _apply_both(spark, tmp_path / "t2", {}, [], batches, ["d", "e"])


def test_fallback_matches_merge_model_schema_evolution(spark, tmp_path):
    batches = [
        [{"pk": 1, "v": 1.0}],
        [{"pk": 2, "v": 2.0, "extra": "new-col"}],  # autoMerge widens
        [{"pk": 1, "v": 1.5}],  # updated row lacks extra -> null
    ]
    _apply_both(spark, tmp_path / "t3", {}, [], batches, ["pk"])


def test_fallback_matches_merge_model_keyless_append(spark, tmp_path):
    batches = [
        [{"a": 1, "b": "x"}],
        [{"a": 1, "b": "x"}],  # duplicate row: append keeps BOTH
        [{"a": 2, "b": "y"}],
    ]
    _apply_both(spark, tmp_path / "t4", {}, [], batches, [])


def test_fallback_diverges_only_on_documented_duplicate_corner(spark, tmp_path):
    # Delta MERGE *raises* when one target row matches multiple source
    # rows; the fallback accepts the batch as-is (documented in
    # writer.py). Pin the divergence so it stays a deliberate choice.
    path = str(tmp_path / "t5")
    df0 = spark.createDataFrame([Row(pk=1, v="a")])
    _write_hub_parquet_merge(spark, df0, path, ["pk"])
    dup = spark.createDataFrame([Row(pk=1, v="b"), Row(pk=1, v="c")])
    _write_hub_parquet_merge(spark, dup, path, ["pk"])
    rows = read_hub(spark, path).collect()
    assert sorted(r.v for r in rows) == ["b", "c"]  # both landed, old gone


def test_delta_branch_unreachable_without_jars(spark):
    # guard: in this container the Delta path must NOT be selected
    # (selecting it without jars would throw deep inside py4j).
    from metadata_ingestion_poc_spark.writer import _delta_available

    assert _delta_available(spark) is False
