"""Model-based random walk over the snapshot protocol.

A seeded random sequence of the four index mutations/maintenance ops —
APPEND, DELETE (tombstone), COMPACT (purge + generation flip), EXPIRE
(generation + dangling-snapshot GC) — is applied to one index while a pure
in-Python model tracks, for the live view and for every archived snapshot
version, the exact set of urls a search must surface.  After every step:

- the live Searcher's matched url set equals the model's live set;
- a randomly chosen archived version that is still listed by
  ``snapshots()`` reproduces exactly the url set recorded when that
  version was committed (time-travel correctness under later appends,
  deletes, purges, generation flips, and expiry);
- ``verify_index`` stays green (commit/lineage coverage, stats
  invariants, CRCs).

This is the protocol-level complement to the scenario tests in
test_snapshots.py: those pin specific orderings; the walk searches the
neighborhood of orderings nobody thought to pin.  Seeded, so failures
reproduce.
"""

import random

from pysearch import corpus
from pysearch.build import build_index
from pysearch.compact import compact_index, expire_generations
from pysearch.delete import delete_docs
from pysearch.lineage import IndexLayout
from pysearch.query import Searcher

QUERY = "in the realm of"


def _chunk(spark, lo, hi):
    """Docs doc://6/<lo..hi> of the 160-doc case-6 corpus (the generator is
    deterministic, so any slice is stable across calls)."""
    from pyspark.sql import functions as F

    df = corpus.webtext_df(spark, cases=[(6, QUERY, 160, 140)])
    return df.filter(F.col("url").between(
        f"doc://6/{lo:04d}", f"doc://6/{hi:04d}"))


def _matching_urls(spark, d, at_version=None):
    s = Searcher(spark, d, at_version=at_version)
    hits = s.search_ids(QUERY, k=500, case_id="6")
    url_of = {int(r["doc_id"]): r["url"]
              for r in s.docs.select("doc_id", "url").collect()}
    return {url_of[int(i)] for i in hits["doc_id"]}


def _model_matches(urls):
    """The case-6 generator puts the phrase only in docs with i % 3 != 2
    (pinned by the recall tests); restrict the model set accordingly."""
    return {u for u in urls if int(u.rsplit("/", 1)[1]) % 3 != 2}


def test_snapshot_protocol_random_walk(spark, tmp_path):
    # separate rngs so victim/version draws can't perturb the op sequence;
    # op seed 6 yields append, expire, compact, append, append, delete,
    # expire, compact, compact, append — every op kind, append first
    rng_ops = random.Random(6)
    rng = random.Random(20260817)
    d = str(tmp_path / "walk_ix")

    build_index(spark, _chunk(spark, 1, 30), d, segment_size=16)
    lay = IndexLayout(d)
    live = set(f"doc://6/{i:04d}" for i in range(1, 31))
    next_lo = 31
    # model: snapshot version -> url set a search must surface there
    snap_model = {lay.snapshots()[-1]: _model_matches(live)}

    ops_run = []
    for step in range(10):
        op = rng_ops.choice(["append", "delete", "compact", "expire"])
        ops_run.append(op)
        if op == "append" and next_lo + 9 <= 160:
            lo, hi = next_lo, next_lo + 9
            next_lo += 10
            build_index(spark, _chunk(spark, lo, hi), d, append=True)
            live |= {f"doc://6/{i:04d}" for i in range(lo, hi + 1)}
            snap_model[lay.snapshots()[-1]] = _model_matches(live)
        elif op == "delete":
            candidates = sorted(_model_matches(live))
            if not candidates:
                continue
            victims = rng.sample(candidates, k=min(3, len(candidates)))
            n = delete_docs(spark, d, urls=victims, case_id="6")
            assert n == len(victims)
            live -= set(victims)
            snap_model[lay.snapshots()[-1]] = _model_matches(live)
        elif op == "compact":
            compact_index(spark, d)
            vs = lay.snapshots()
            if vs:  # purge-less compaction may not add a snapshot
                snap_model[vs[-1]] = _model_matches(live)
        elif op == "expire":
            expire_generations(lay)

        # drop model entries whose archived manifests were pruned
        listed = set(lay.snapshots())
        snap_model = {v: s for v, s in snap_model.items() if v in listed}

        # live view always equals the model
        got = _matching_urls(spark, d)
        assert got == _model_matches(live), (step, op, ops_run)

        # a random archived version reproduces its recorded state
        if snap_model:
            v = rng.choice(sorted(snap_model))
            assert _matching_urls(spark, d, at_version=v) == snap_model[v], (
                step, op, v, ops_run)

    from pysearch.verify import verify_index

    assert verify_index(spark, d) == []
    # sanity on coverage: the walk must have exercised every op kind
    assert {"append", "delete", "compact", "expire"} <= set(ops_run)
