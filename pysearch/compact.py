"""Offline index compaction — collapse accumulated commit batches.

Incremental appends (``build_index(append=True)``, streaming
``foreach_batch_indexer``) each add a ``commit-NNNNN`` batch per table, and
``IndexLayout.read_commits`` unions one parquet read per commit — O(commits)
scans per query after many appends (the scale risk called out in the r1
review of ``lineage.read_commits``).  ``compact_index`` rewrites every
multi-commit table into a single consolidated ``commit-00000`` with the same
partition layout the build writes (docs/doc_map by ``case_id``, postings by
``term_bucket`` — query partition pruning survives), renumbers lineage
bookkeeping to the consolidated batch, and records the compaction as a
lineage event.  Query results are unchanged (same rows, same layout); the
reference has no analog because its index is a single serial file — this is
the maintenance operation its model never needs but a distributed
commit-log layout does.

Crash safety: consolidated trees are staged per table as ``<table>.compact``
and swapped in with two renames; an interrupted run is completed (or its
leftovers cleared) by simply re-running ``compact_index``, which starts with
a recovery sweep.  Compaction is offline maintenance — run it without
concurrent readers, like any snapshot-expire/rewrite job.
"""

from __future__ import annotations

import datetime as _dt
import os
import shutil
import time

from pysearch.lineage import IndexLayout


def _recover(table_dir: str) -> None:
    """Finish or discard a previous run's partial swap for one table."""
    compact, old = table_dir + ".compact", table_dir + ".old"
    if os.path.isdir(compact):
        if not os.path.isdir(table_dir):
            os.rename(compact, table_dir)  # crashed between the two renames
        else:
            shutil.rmtree(compact)  # staged but never swapped: discard
    if os.path.isdir(old):
        shutil.rmtree(old)


def _swap(table_dir: str) -> None:
    old = table_dir + ".old"
    os.rename(table_dir, old)
    os.rename(table_dir + ".compact", table_dir)
    shutil.rmtree(old)


def compact_index(spark, index_dir: str) -> dict:
    """Consolidate every multi-commit table of a COMPLETE index.

    Returns ``{table: n_commits_before}`` for the tables rewritten (empty
    dict == nothing to do).  Raises if the index is incomplete — compacting
    mid-build would race the builder's resume bookkeeping.
    """
    from pyspark.sql import functions as F

    from pysearch.schema import DOCS, POSTING_BLOCKS

    layout = IndexLayout(index_dir)
    if not layout.stage_done("finalize"):
        raise RuntimeError(f"index at {index_dir} is not complete")

    for t in (layout.docs, layout.doc_map, layout.postings, layout.lineage):
        _recover(t)

    # per table: schema, partition columns, within-partition sort (mirrors
    # the build's write layout so parquet row-group pruning keeps working)
    plan = {}
    for t, schema, parts, sort in (
        (layout.docs, DOCS, ["case_id"], ["doc_id"]),
        (layout.doc_map, None, ["case_id"], ["doc_id"]),
        (layout.postings, POSTING_BLOCKS, ["term_bucket"],
         ["case_id", "term", "segment_id", "block_id"]),
    ):
        n = len(layout.list_commits(t))
        if n > 1:
            plan[t] = (schema, parts, sort, n)
    n_lineage = len(layout.list_commits(layout.lineage))
    if not plan and n_lineage <= 1:
        return {}

    t0 = time.time()
    # 1. stage consolidated trees (heavy, restartable, index untouched)
    for t, (schema, parts, sort, _n) in plan.items():
        df = layout.read_commits(spark, t, schema=schema)
        (
            df.repartition(*parts)
            .sortWithinPartitions(*parts, *sort)
            .write.mode("overwrite")
            .partitionBy(*parts)
            .parquet(os.path.join(t + ".compact", "commit-00000"))
        )

    # 2. consolidated lineage: same history, but done docs/postings rows
    #    renumbered to the consolidated batch 0 so commit<->lineage coverage
    #    (verify_index, orphan GC, resume) stays exact.  The compaction
    #    event rides in the same single commit, so a compacted index has
    #    exactly one lineage commit and re-running is a clean no-op.
    from pysearch.schema import LINEAGE

    lin = layout.read_lineage(spark)
    remapped = lin.withColumn(
        "batch",
        F.when(
            lin.stage.isin("docs", "postings") & (lin.status == "done"),
            F.lit(0),
        ).otherwise(lin.batch).cast("int"),
    )
    event = spark.createDataFrame([(
        "compact", "all", 0, "done",
        sum(n for _, _, _, n in plan.values()), None, None,
        time.time() - t0, _dt.datetime.now(_dt.timezone.utc),
    )], schema=LINEAGE)
    remapped.unionByName(event).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(layout.lineage + ".compact", "commit-00000")
    )

    # 3. swap everything in (cheap renames), lineage last
    for t in plan:
        _swap(t)
    _swap(layout.lineage)
    return {os.path.basename(t): n for t, (_s, _p, _sort, n) in plan.items()}
