"""Spark-free unit tests for the compaction swap/recovery state machine.

The crash windows of ``compact_index`` are between directory renames
(see pysearch/compact.py): these tests drive ``_recover``/``_swap``
directly on synthetic trees to pin the recovery semantics without a
SparkSession.
"""

import os

from pysearch.compact import _recover, _swap


def _mk(d, marker):
    os.makedirs(d, exist_ok=True)
    with open(os.path.join(d, marker), "w") as f:
        f.write(marker)


def _has(d, marker):
    return os.path.exists(os.path.join(d, marker))


def test_recover_finishes_interrupted_swap(tmp_path):
    """Crash between rename(table -> .old) and rename(.compact -> table):
    table is missing, .compact holds the new tree -> recovery installs it."""
    t = str(tmp_path / "docs")
    _mk(t + ".compact", "new")
    _recover(t)
    assert os.path.isdir(t) and _has(t, "new")
    assert not os.path.isdir(t + ".compact")


def test_recover_discards_unswapped_staging(tmp_path):
    """Crash after staging but before any rename: the live table is intact,
    the staged tree is stale (tables may have changed) -> discard it."""
    t = str(tmp_path / "docs")
    _mk(t, "live")
    _mk(t + ".compact", "stale")
    _recover(t)
    assert _has(t, "live")
    assert not os.path.isdir(t + ".compact")


def test_recover_clears_leftover_old(tmp_path):
    """Crash between rename(.compact -> table) and rmtree(.old): both the
    new table and the .old tree exist -> drop the .old tree."""
    t = str(tmp_path / "docs")
    _mk(t, "new")
    _mk(t + ".old", "old")
    _recover(t)
    assert _has(t, "new")
    assert not os.path.isdir(t + ".old")


def test_swap_replaces_and_cleans(tmp_path):
    t = str(tmp_path / "docs")
    _mk(t, "live")
    _mk(t + ".compact", "new")
    _swap(t)
    assert _has(t, "new")
    assert not os.path.isdir(t + ".old")
    assert not os.path.isdir(t + ".compact")


def test_recover_noop_on_clean_table(tmp_path):
    t = str(tmp_path / "docs")
    _mk(t, "live")
    _recover(t)
    assert _has(t, "live")
