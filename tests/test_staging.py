"""Crash-safety of the staging-dir swap (staging.py).

Simulates every crash point of commit_swap by reconstructing the
on-disk state it leaves behind, then asserts recover() restores a
complete table with either the old or the new contents — never a
missing or half-written one.
"""

from __future__ import annotations

import os
import shutil
import subprocess
import sys
from pathlib import Path

import pytest

from metadata_ingestion_poc_spark.staging import (
    COMMIT_MARKER,
    commit_swap,
    recover,
    staging_dir,
)


def _mk_table(path: Path, tag: str) -> None:
    path.mkdir(parents=True)
    (path / "part-0.parquet").write_text(tag)


def _read_tag(path: Path) -> str:
    return (path / "part-0.parquet").read_text()


def test_commit_swap_happy_path(tmp_path):
    live = tmp_path / "t"
    _mk_table(live, "old")
    stg = staging_dir(live)
    _mk_table(stg, "new")
    commit_swap(live, stg)
    assert _read_tag(live) == "new"
    assert not stg.exists()
    assert not (tmp_path / "t__old").exists()


def test_commit_swap_initial_write(tmp_path):
    live = tmp_path / "t"
    stg = staging_dir(live)
    _mk_table(stg, "v1")
    commit_swap(live, stg)
    assert _read_tag(live) == "v1"


def test_recover_crash_before_commit_marker(tmp_path):
    # crash during the staging write: staging exists, no marker.
    live = tmp_path / "t"
    _mk_table(live, "old")
    stg = staging_dir(live)
    _mk_table(stg, "half-written")
    recover(live)
    assert _read_tag(live) == "old"
    assert not stg.exists()


def test_recover_crash_after_rename_aside(tmp_path):
    # crash between move(live, old) and move(staging, live):
    # live missing, staging committed, old holds the previous copy.
    live = tmp_path / "t"
    stg = staging_dir(live)
    old = tmp_path / "t__old"
    _mk_table(old, "old")
    _mk_table(stg, "new")
    (stg / COMMIT_MARKER).touch()
    recover(live)
    assert _read_tag(live) == "new"
    assert not stg.exists() and not old.exists()


def test_recover_crash_after_move_in(tmp_path):
    # crash before the final rmtree(old): live is new, old leftover.
    live = tmp_path / "t"
    _mk_table(live, "new")
    old = tmp_path / "t__old"
    _mk_table(old, "old")
    recover(live)
    assert _read_tag(live) == "new"
    assert not old.exists()


def test_recover_rename_aside_with_uncommitted_staging(tmp_path):
    # pathological: live renamed aside, then staging write was found
    # incomplete (no marker) — must restore the old copy.
    live = tmp_path / "t"
    old = tmp_path / "t__old"
    stg = staging_dir(live)
    _mk_table(old, "old")
    _mk_table(stg, "half")
    recover(live)
    assert _read_tag(live) == "old"
    assert not stg.exists()


def test_recover_initial_write_crash(tmp_path):
    # initial load died mid-write: only an uncommitted staging exists.
    live = tmp_path / "t"
    stg = staging_dir(live)
    _mk_table(stg, "half")
    recover(live)
    assert not live.exists() and not stg.exists()


def test_recover_is_idempotent(tmp_path):
    live = tmp_path / "t"
    stg = staging_dir(live)
    _mk_table(stg, "new")
    (stg / COMMIT_MARKER).touch()
    recover(live)
    recover(live)
    assert _read_tag(live) == "new"


# real-process crash: the child runs commit_swap and SIGKILLs ITSELF
# (no cleanup handlers, no atexit — the same torn state a machine
# loss leaves) at a chosen point in the move sequence; the parent
# then runs recover() and must find a complete table.
_CRASH_CHILD = """
import os, shutil, sys
sys.path.insert(0, {repo!r})
from pathlib import Path
from metadata_ingestion_poc_spark import staging as st

target = Path(sys.argv[1])
crash = sys.argv[2]
orig_move = shutil.move

def move(src, dst):
    if crash == "before_aside":
        os.kill(os.getpid(), 9)
    orig_move(src, dst)
    if crash == "after_aside" and str(dst).endswith("__old"):
        os.kill(os.getpid(), 9)
    if crash == "after_movein" and str(dst) == str(target):
        os.kill(os.getpid(), 9)

shutil.move = move
st.commit_swap(target, st.staging_dir(target))
"""


@pytest.mark.parametrize(
    "crash,expect",
    [
        # killed after the marker but before any move: old copy survives
        ("before_aside", "old"),
        # killed between rename-aside and move-in — the window where no
        # live dir exists; committed staging must complete the swap
        ("after_aside", "new"),
        # killed between move-in and old-copy cleanup
        ("after_movein", "new"),
    ],
)
def test_sigkill_mid_swap_recovers(tmp_path, crash, expect):
    repo = str(Path(__file__).resolve().parents[1])
    live = tmp_path / "t"
    _mk_table(live, "old")
    stg = staging_dir(live)
    _mk_table(stg, "new")

    proc = subprocess.run(
        [sys.executable, "-c", _CRASH_CHILD.format(repo=repo),
         str(live), crash],
        capture_output=True,
        timeout=60,
    )
    assert proc.returncode == -9, (
        f"child should die by SIGKILL, got {proc.returncode}: "
        f"{proc.stderr.decode()}"
    )
    if crash == "after_aside":
        assert not live.exists(), "precondition: crash left no live dir"

    recover(live)
    assert live.exists()
    assert _read_tag(live) == expect
    assert not staging_dir(live).exists()
    assert not (tmp_path / "t__old").exists()
    # a second writer arriving later must see a normal table
    recover(live)
    assert _read_tag(live) == expect


def test_every_crash_point_leaves_a_recoverable_table(tmp_path):
    # exhaustive: replay commit_swap's step sequence, crash after each
    # step, recover, and assert a complete table with old or new data.
    steps = ["marker", "rename_aside", "move_in", "cleanup"]
    for crash_after in range(len(steps) + 1):
        root = tmp_path / f"case{crash_after}"
        root.mkdir()
        live, old = root / "t", root / "t__old"
        _mk_table(live, "old")
        stg = staging_dir(live)
        _mk_table(stg, "new")
        for step in steps[:crash_after]:
            if step == "marker":
                (stg / COMMIT_MARKER).touch()
            elif step == "rename_aside":
                shutil.move(str(live), str(old))
            elif step == "move_in":
                shutil.move(str(stg), str(live))
            elif step == "cleanup":
                shutil.rmtree(str(old))
        recover(live)
        assert live.exists(), f"table lost at crash point {crash_after}"
        tag = _read_tag(live)
        expect = "old" if crash_after < 2 else "new"
        assert tag == expect, f"crash point {crash_after}: got {tag}"
