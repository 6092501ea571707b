"""Spark-free unit tests for the compaction swap/recovery state machine.

``compact_index`` stages consolidated trees, then writes a write-ahead swap
marker (the commit point), then swaps each table with two renames (see
pysearch/compact.py).  The crash windows are: during staging (no marker —
live index authoritative, staging discarded), and anywhere after the marker
write (swap committed — every listed table must be driven to the new tree).
These tests drive ``recover_compaction``/``_finish_swap`` directly on
synthetic trees to pin the semantics without a SparkSession, including the
r2-ADVICE scenario: a crash BETWEEN table swaps must not leave stale lineage
aliasing live batch numbers.
"""

import json
import os

from pysearch.compact import (SWAP_MARKER, _discard_staging, _finish_swap,
                              recover_compaction)
from pysearch.lineage import IndexLayout


def _mk(d, marker):
    os.makedirs(d, exist_ok=True)
    with open(os.path.join(d, marker), "w") as f:
        f.write(marker)


def _has(d, marker):
    return os.path.exists(os.path.join(d, marker))


def _layout_with_marker(tmp_path, tables):
    root = str(tmp_path / "ix")
    os.makedirs(root, exist_ok=True)
    with open(os.path.join(root, SWAP_MARKER), "w") as f:
        json.dump({"tables": tables}, f)
    return IndexLayout(root)


def test_committed_swap_is_finished_from_scratch(tmp_path):
    """Crash right after the marker write: every table still live, every
    .compact staged -> recovery installs all of them and drops the marker."""
    lay = _layout_with_marker(tmp_path, ["docs", "postings", "lineage"])
    for name in ("docs", "postings", "lineage"):
        _mk(os.path.join(lay.root, name), "live")
        _mk(os.path.join(lay.root, name) + ".compact", "new")
    assert recover_compaction(lay) == "finished"
    for name in ("docs", "postings", "lineage"):
        t = os.path.join(lay.root, name)
        assert _has(t, "new")
        assert not os.path.isdir(t + ".compact")
        assert not os.path.isdir(t + ".old")
    assert not os.path.exists(os.path.join(lay.root, SWAP_MARKER))


def test_committed_swap_finishes_half_swapped_tables(tmp_path):
    """The r2-ADVICE crash: docs/postings already swapped, lineage not yet.
    Recovery must install the staged lineage (same renumbered history the
    swapped tables assume), NOT discard it."""
    lay = _layout_with_marker(tmp_path, ["docs", "postings", "lineage"])
    for name in ("docs", "postings"):  # already swapped
        _mk(os.path.join(lay.root, name), "new")
    _mk(os.path.join(lay.root, "lineage"), "live")
    _mk(os.path.join(lay.root, "lineage") + ".compact", "new")
    assert recover_compaction(lay) == "finished"
    assert _has(os.path.join(lay.root, "lineage"), "new")
    assert not os.path.exists(os.path.join(lay.root, SWAP_MARKER))


def test_committed_swap_mid_table_rename(tmp_path):
    """Crash between rename(table -> .old) and rename(.compact -> table):
    table missing, .compact + .old present -> new tree installed, old
    dropped."""
    lay = _layout_with_marker(tmp_path, ["docs"])
    t = os.path.join(lay.root, "docs")
    _mk(t + ".old", "old")
    _mk(t + ".compact", "new")
    assert recover_compaction(lay) == "finished"
    assert _has(t, "new")
    assert not os.path.isdir(t + ".old") and not os.path.isdir(t + ".compact")


def test_committed_swap_leftover_old_only(tmp_path):
    """Crash between rename(.compact -> table) and rmtree(.old)."""
    lay = _layout_with_marker(tmp_path, ["docs"])
    t = os.path.join(lay.root, "docs")
    _mk(t, "new")
    _mk(t + ".old", "old")
    assert recover_compaction(lay) == "finished"
    assert _has(t, "new") and not os.path.isdir(t + ".old")


def test_uncommitted_staging_is_discarded(tmp_path):
    """No marker: the live table is authoritative; staged trees (possibly
    stale) are dropped."""
    root = str(tmp_path / "ix")
    lay = IndexLayout(root)
    _mk(lay.docs, "live")
    _mk(lay.docs + ".compact", "stale")
    _mk(lay.lineage, "live")
    _mk(lay.lineage + ".old", "old")
    assert recover_compaction(lay) == "discarded"
    assert _has(lay.docs, "live")
    assert not os.path.isdir(lay.docs + ".compact")
    assert _has(lay.lineage, "live")
    assert not os.path.isdir(lay.lineage + ".old")


def test_recover_noop_on_clean_index(tmp_path):
    root = str(tmp_path / "ix")
    lay = IndexLayout(root)
    _mk(lay.docs, "live")
    assert recover_compaction(lay) is None
    assert _has(lay.docs, "live")


def test_finish_swap_is_idempotent(tmp_path):
    t = str(tmp_path / "docs")
    _mk(t, "live")
    _mk(t + ".compact", "new")
    _finish_swap(t)
    _finish_swap(t)  # second run is a no-op
    assert _has(t, "new")
    assert not os.path.isdir(t + ".old") and not os.path.isdir(t + ".compact")


def test_discard_staging_keeps_live(tmp_path):
    t = str(tmp_path / "docs")
    _mk(t, "live")
    _mk(t + ".compact", "stale")
    _mk(t + ".old", "old")
    _discard_staging(t)
    assert _has(t, "live")
    assert not os.path.isdir(t + ".compact") and not os.path.isdir(t + ".old")


def test_fold_repin_is_inside_marker_window(tmp_path, monkeypatch):
    """r3-ADVICE crash window: a crash BETWEEN the table swaps and the
    marker removal must never leave (marker gone, folded stale).  The fold
    re-pin therefore runs BEFORE os.remove(marker): simulate the crash by
    making the marker removal raise — folded must already be [0] with the
    marker still present, and a second (uncrashed) recovery completes."""
    import pysearch.compact as C

    lay = _layout_with_marker(tmp_path, ["postings", "lineage"])
    _mk(lay.postings, "new")
    _mk(lay.lineage + ".compact", "new")
    lay.write_manifest({"stages": {"finalize": {"done": True,
                                                "folded": [0, 1, 2]}}})
    marker = os.path.join(lay.root, SWAP_MARKER)
    real_remove = os.remove

    def crash_on_marker(path, *a, **kw):
        if path == marker:
            raise OSError("simulated crash before marker removal")
        return real_remove(path, *a, **kw)

    monkeypatch.setattr(C.os, "remove", crash_on_marker)
    try:
        recover_compaction(lay)
    except OSError:
        pass
    # invariant: fold set already consolidated while the marker survives
    assert lay.read_manifest()["stages"]["finalize"]["folded"] == [0]
    assert os.path.exists(marker)
    monkeypatch.setattr(C.os, "remove", real_remove)
    assert recover_compaction(lay) == "finished"
    assert not os.path.exists(marker)
    assert lay.read_manifest()["stages"]["finalize"]["folded"] == [0]


def test_recovery_repins_folded_batches(tmp_path):
    """A finished recovery must reset the delta-finalize fold set to the
    consolidated batch 0 — the swapped lineage renumbered every done batch."""
    lay = _layout_with_marker(tmp_path, ["postings", "lineage"])
    _mk(lay.postings, "new")
    _mk(lay.lineage, "live")
    _mk(lay.lineage + ".compact", "new")
    lay.write_manifest({"stages": {"finalize": {"done": True,
                                                "folded": [0, 1, 2]}}})
    # write_manifest rewrote the marker-bearing root? no — marker is its own
    # file; re-assert it survived before recovering
    assert os.path.exists(os.path.join(lay.root, SWAP_MARKER))
    assert recover_compaction(lay) == "finished"
    m = lay.read_manifest()
    assert m["stages"]["finalize"]["folded"] == [0]
