"""Spark-free unit tests for the compaction snapshot-commit protocol.

``compact_index`` stages consolidated trees as each table's NEXT generation
directory, then commits with ONE atomic manifest write that flips the
per-table ``generations`` pointers and carries all dependent bookkeeping
(see pysearch/compact.py).  The only crash window with disk effects is
during staging: the live index is untouched and authoritative, and the
staged trees are unreferenced until the pointer flip — recovery just
discards generations NEWER than the committed pointer.  Generations OLDER
than the pointer are retained snapshots (readers in flight during a
compaction keep their resolved file paths) removed by
``expire_generations``.  These tests drive the layout resolution, the
recovery sweep, and the retention/expiry semantics on synthetic trees
without a SparkSession.
"""

import os

from pysearch.compact import expire_generations, recover_compaction
from pysearch.lineage import IndexLayout


def _mk(d, tag):
    os.makedirs(d, exist_ok=True)
    with open(os.path.join(d, tag), "w") as f:
        f.write(tag)


def _has(d, tag):
    return os.path.exists(os.path.join(d, tag))


def _layout(tmp_path, generations=None):
    root = str(tmp_path / "ix")
    lay = IndexLayout(root)
    os.makedirs(root, exist_ok=True)
    if generations is not None:
        lay.write_manifest({"generations": generations})
    return lay


def test_table_paths_resolve_through_generations(tmp_path):
    """Generation 0 is the plain table dir; N>=1 appends ``.gN``; the
    pointer map re-reads when the manifest changes (atomic replace)."""
    lay = _layout(tmp_path)
    assert lay.docs == os.path.join(lay.root, "docs")
    lay.write_manifest({"generations": {"docs": 2, "postings": 1}})
    assert lay.docs == os.path.join(lay.root, "docs.g2")
    assert lay.postings == os.path.join(lay.root, "postings.g1")
    assert lay.lineage == os.path.join(lay.root, "lineage")  # unflipped
    lay.write_manifest({"generations": {"docs": 3}})
    assert lay.docs == os.path.join(lay.root, "docs.g3")


def test_generation_paths_lists_all_trees(tmp_path):
    lay = _layout(tmp_path)
    _mk(os.path.join(lay.root, "docs"), "g0")
    _mk(os.path.join(lay.root, "docs.g1"), "g1")
    _mk(os.path.join(lay.root, "docs.g3"), "g3")
    _mk(os.path.join(lay.root, "docs.gx"), "junk")  # non-numeric: ignored
    got = lay.generation_paths("docs")
    assert sorted(got) == [0, 1, 3]
    assert got[3].endswith("docs.g3")


def test_uncommitted_staging_is_discarded(tmp_path):
    """Staged generations NEWER than the committed pointer are leftovers
    of a crashed (uncommitted) run: recovery drops them, live trees and
    retained older snapshots stay."""
    lay = _layout(tmp_path, generations={"docs": 1})
    _mk(os.path.join(lay.root, "docs"), "g0-retained")
    _mk(os.path.join(lay.root, "docs.g1"), "live")
    _mk(os.path.join(lay.root, "docs.g2"), "staged-stale")
    _mk(os.path.join(lay.root, "postings"), "live")
    _mk(os.path.join(lay.root, "postings.g1"), "staged-stale")
    assert recover_compaction(lay) == "discarded"
    assert _has(lay.docs, "live")
    assert _has(os.path.join(lay.root, "docs"), "g0-retained")
    assert not os.path.isdir(os.path.join(lay.root, "docs.g2"))
    assert _has(lay.postings, "live")
    assert not os.path.isdir(os.path.join(lay.root, "postings.g1"))


def test_recover_noop_on_clean_index(tmp_path):
    lay = _layout(tmp_path, generations={"docs": 1})
    _mk(os.path.join(lay.root, "docs"), "g0-retained")
    _mk(os.path.join(lay.root, "docs.g1"), "live")
    assert recover_compaction(lay) is None
    assert _has(lay.docs, "live")
    assert _has(os.path.join(lay.root, "docs"), "g0-retained")


def test_commit_is_the_manifest_write(tmp_path):
    """Before the pointer flip the staged tree is invisible to every path
    resolution; after it, it IS the table — no intermediate state."""
    lay = _layout(tmp_path)
    _mk(os.path.join(lay.root, "postings"), "old")
    _mk(os.path.join(lay.root, "postings.g1"), "new")
    assert _has(lay.postings, "old")  # uncommitted: resolves to g0
    m = lay.read_manifest()
    m.setdefault("generations", {})["postings"] = 1
    lay.write_manifest(m)  # the commit point
    assert _has(lay.postings, "new")
    # the superseded tree is retained for in-flight readers
    assert _has(os.path.join(lay.root, "postings"), "old")


def test_stats_rotation_flips_both_pointers_in_one_write(tmp_path, monkeypatch):
    """A finalize stats recompute must never expose NEW term_stats with
    STALE corpus_stats (df > n_docs under a reader's frozen generation
    map): both trees flip in a SINGLE manifest write."""
    from pysearch.build import _commit_stats_tables

    lay = _layout(tmp_path, generations={})
    m = lay.read_manifest()
    m["snapshot_version"] = 1  # snapshot-bearing: the rotating branch
    lay.write_manifest(m)
    st_ts = str(tmp_path / "stage_ts")
    st_cs = str(tmp_path / "stage_cs")
    _mk(st_ts, "ts-new")
    _mk(st_cs, "cs-new")

    writes = []
    orig = IndexLayout.write_manifest

    def counting(self, manifest):
        writes.append(dict(manifest.get("generations", {})))
        orig(self, manifest)

    monkeypatch.setattr(IndexLayout, "write_manifest", counting)
    _commit_stats_tables(lay, [("term_stats", st_ts, True),
                               ("corpus_stats", st_cs, False)])
    assert len(writes) == 1, writes
    assert writes[0] == {"term_stats": 1, "corpus_stats": 1}
    assert _has(os.path.join(lay.term_stats), "ts-new") is False  # moved
    assert _has(os.path.join(lay.term_stats, "commit-00000"), "ts-new")
    assert _has(os.path.join(lay.corpus_stats, "commit-00000"), "cs-new")


def test_prune_snapshots_skips_transient_read_failures(tmp_path):
    """A snapshot archive that cannot be READ (OSError) must be skipped,
    not deleted — only provably-corrupt JSON is auto-removed."""
    from pysearch.compact import prune_dangling_snapshots

    lay = _layout(tmp_path, generations={})
    m = lay.read_manifest()
    m["snapshot_version"] = 2
    lay.write_manifest(m)
    # v1: a directory where the archive file should be -> open() raises
    # IsADirectoryError (an OSError that is not a JSON problem)
    os.makedirs(f"{lay.manifest_path}.v1")
    # v2: corrupt JSON -> removed
    with open(f"{lay.manifest_path}.v2", "w") as f:
        f.write("{not json")
    pruned = prune_dangling_snapshots(lay)
    assert pruned == [2]
    assert os.path.isdir(f"{lay.manifest_path}.v1")  # survived
    assert not os.path.exists(f"{lay.manifest_path}.v2")


def test_expire_generations_removes_older_trees(tmp_path):
    lay = _layout(tmp_path, generations={"docs": 2, "postings": 1})
    _mk(os.path.join(lay.root, "docs"), "g0")
    _mk(os.path.join(lay.root, "docs.g1"), "g1")
    _mk(os.path.join(lay.root, "docs.g2"), "live")
    _mk(os.path.join(lay.root, "postings"), "g0")
    _mk(os.path.join(lay.root, "postings.g1"), "live")
    removed = expire_generations(lay)
    assert len(removed) == 3
    assert _has(lay.docs, "live") and _has(lay.postings, "live")
    assert not os.path.isdir(os.path.join(lay.root, "docs"))
    assert not os.path.isdir(os.path.join(lay.root, "docs.g1"))
    assert not os.path.isdir(os.path.join(lay.root, "postings"))


def test_expire_generations_keep_previous(tmp_path):
    """``keep=N`` retains that one pre-current generation (the just-
    superseded snapshot in-flight readers may still be scanning)."""
    lay = _layout(tmp_path, generations={"docs": 2})
    _mk(os.path.join(lay.root, "docs"), "g0")
    _mk(os.path.join(lay.root, "docs.g1"), "g1")
    _mk(os.path.join(lay.root, "docs.g2"), "live")
    removed = expire_generations(lay, keep=1)
    assert [os.path.basename(p) for p in removed] == ["docs"]
    assert os.path.isdir(os.path.join(lay.root, "docs.g1"))
    assert _has(lay.docs, "live")


def test_expire_noop_when_single_generation(tmp_path):
    lay = _layout(tmp_path)
    _mk(os.path.join(lay.root, "docs"), "live")
    assert expire_generations(lay) == []
    assert _has(lay.docs, "live")
