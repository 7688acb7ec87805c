"""Crash-safe staging-directory swap for single-writer table rewrite.

The naive rewrite (`rmtree(live); move(staging, live)`) has a crash
window where NO complete copy of the table exists on disk. This module
closes it:

- the staging dir is only trusted once it carries a ``_COMMITTED``
  marker (written after the full Spark write succeeds);
- the live dir is renamed ASIDE (``__old``) before staging moves in,
  so at every instant at least one complete copy exists;
- :func:`recover` repairs any interrupted state (finish the swap if
  staging was committed, restore the old dir otherwise) and is called
  by writers before they touch the table and by readers before load.

Marker files/dirs all start with ``_`` so Spark's file-listing treats
them as hidden and never reads them as data.

Single-writer contract (same as the reference's POC writer): two
concurrent writers to the same path can still race; at cluster scale
this pattern is replaced by a transactional table format (Delta —
see writer.py), which provides the same swap via its commit log.
"""

from __future__ import annotations

import shutil
from pathlib import Path

COMMIT_MARKER = "_COMMITTED"


def staging_dir(target: Path) -> Path:
    return target.with_name(target.name + "__staging")


def _old_dir(target: Path) -> Path:
    return target.with_name(target.name + "__old")


def _is_committed(staging: Path) -> bool:
    return (staging / COMMIT_MARKER).exists()


def recover(target: Path) -> None:
    """Repair an interrupted swap so `target` is a complete table.

    Idempotent; call before any read of or write to `target`.
    """
    staging, old = staging_dir(target), _old_dir(target)
    if target.exists():
        # live table intact — staging/old are leftovers of a swap that
        # either finished (old) or never started committing (staging).
        if staging.exists():
            shutil.rmtree(staging)
        if old.exists():
            shutil.rmtree(old)
        return
    if staging.exists() and _is_committed(staging):
        # crash between rename-aside and move-in: finish the swap.
        shutil.move(str(staging), str(target))
        if old.exists():
            shutil.rmtree(old)
        return
    if old.exists():
        # crash with an uncommitted/absent staging: restore the old copy.
        shutil.move(str(old), str(target))
        if staging.exists():
            shutil.rmtree(staging)
        return
    # no live, no committed staging, no old: table never existed (or an
    # initial write crashed mid-flight) — drop any partial staging.
    if staging.exists():
        shutil.rmtree(staging)


def commit_swap(target: Path, staging: Path) -> None:
    """Replace `target` with a fully-written `staging` dir.

    Marks staging committed first, renames the live dir aside, moves
    staging in, then drops the old copy — every crash point leaves a
    state :func:`recover` completes.
    """
    (staging / COMMIT_MARKER).touch()
    old = _old_dir(target)
    if old.exists():
        shutil.rmtree(old)
    if target.exists():
        shutil.move(str(target), str(old))
    shutil.move(str(staging), str(target))
    if old.exists():
        shutil.rmtree(old)
