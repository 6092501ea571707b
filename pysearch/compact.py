"""Offline index compaction — collapse accumulated commit batches.

Incremental appends (``build_index(append=True)``, streaming
``foreach_batch_indexer``) each add a ``commit-NNNNN`` batch per table, and
``IndexLayout.read_commits`` unions one parquet read per commit — O(commits)
scans per query after many appends (the scale risk called out in the r1
review of ``lineage.read_commits``).  ``compact_index`` rewrites every
multi-commit table into a single consolidated ``commit-00000`` with the same
partition layout the build writes (docs/doc_map by ``case_id``, postings by
``term_bucket`` — query partition pruning survives), consolidates the
term_stats delta commits by SUMMING per-term df/cf (delta finalize appends
one stats commit per postings batch, see build.finalize_delta), renumbers
lineage bookkeeping to the consolidated batch, and records the compaction as
a lineage event.  Query results are unchanged (same rows, same layout); the
reference has no analog because its index is a single serial file — this is
the maintenance operation its model never needs but a distributed
commit-log layout does.

Crash safety — cross-TABLE atomicity via a write-ahead swap marker
(r2 ADVICE: per-table swaps alone leave a half-swapped index that aliases
batch numbers if an append runs before recovery):

1. consolidated trees are staged per table as ``<table>.compact`` with the
   live index untouched (heavy, restartable);
2. a marker file ``_compact_swap.json`` listing the tables to swap is
   written atomically — this is the commit point;
3. tables are swapped in with two renames each; the marker is removed last.

Recovery (``recover_compaction``) is driven by the marker: present means the
swap was committed, so every listed table's swap is FINISHED (idempotent
per-table state machine in ``_finish_swap``); absent means any leftover
``.compact``/``.old`` trees belong to an uncommitted run and are discarded.
``build_index(append=True)`` runs this sweep before touching the index, so a
crashed compaction can never alias batch numbers against stale lineage.
Compaction is offline maintenance — run it without concurrent readers, like
any snapshot-expire/rewrite job.
"""

from __future__ import annotations

import datetime as _dt
import json
import os
import shutil
import time
import uuid

from pysearch.lineage import IndexLayout

SWAP_MARKER = "_compact_swap.json"


def _marker_path(layout: IndexLayout) -> str:
    return os.path.join(layout.root, SWAP_MARKER)


def _write_marker(layout: IndexLayout, tables: list[str],
                  manifest_updates: dict | None = None) -> None:
    """``manifest_updates`` rides IN the marker so a crash mid-swap replays
    them from recovery (same protocol as the fold re-pin): ``case_counts``
    (post-purge per-case doc counts) and ``clear_tombstones``."""
    tmp = _marker_path(layout) + f".tmp.{uuid.uuid4().hex}"
    with open(tmp, "w") as f:
        json.dump({"tables": tables,
                   "manifest_updates": manifest_updates or {}}, f)
    os.replace(tmp, _marker_path(layout))


def _apply_manifest_updates(layout: IndexLayout, updates: dict) -> None:
    """Idempotently apply marker-carried manifest updates (purge
    bookkeeping) — called inside the marker window in both the normal and
    the recovery path."""
    if not updates:
        return
    m = layout.read_manifest()
    if "case_counts" in updates:
        docs_stage = m.setdefault("stages", {}).setdefault("docs", {})
        docs_stage["case_counts"] = updates["case_counts"]
        docs_stage["n_docs"] = sum(updates["case_counts"].values())
    if updates.get("clear_tombstones"):
        m.pop("tombstones", None)
    layout.write_manifest(m)


def _finish_swap(table_dir: str) -> None:
    """Idempotently drive one table's swap to completion.  Valid only when
    the swap was COMMITTED (marker present): a ``.compact`` tree here is the
    new truth and must be installed, whatever rename the crash interrupted."""
    compact, old = table_dir + ".compact", table_dir + ".old"
    if os.path.isdir(compact):
        if os.path.isdir(table_dir):
            os.rename(table_dir, old)
        os.rename(compact, table_dir)
    if os.path.isdir(old):
        shutil.rmtree(old)


def _discard_staging(table_dir: str) -> None:
    """Drop leftovers of an UNcommitted run (no marker): the live table is
    intact and authoritative; staged trees may be stale."""
    for d in (table_dir + ".compact", table_dir + ".old"):
        if os.path.isdir(d):
            shutil.rmtree(d)


def _all_tables(layout: IndexLayout) -> list[str]:
    return [layout.docs, layout.doc_map, layout.postings,
            layout.term_stats, layout.corpus_stats, layout.lineage,
            layout.tombstones]


def recover_compaction(layout: IndexLayout) -> str | None:
    """Finish a committed-but-interrupted compaction swap, or discard an
    uncommitted one.  Returns ``"finished"`` / ``"discarded"`` / ``None``
    (nothing to do).  Safe to call any time the index is quiescent; append
    and streaming ingestion call it before touching the index."""
    marker = _marker_path(layout)
    if os.path.exists(marker):
        with open(marker) as f:
            mk = json.load(f)
        tables = mk["tables"]
        for name in tables:
            _finish_swap(os.path.join(layout.root, name))
        # tables not in the marker may still hold uncommitted staging
        listed = {os.path.join(layout.root, n) for n in tables}
        for t in _all_tables(layout):
            if t not in listed:
                _discard_staging(t)
        # the committed lineage/batch renumbering is now fully installed;
        # re-pin the finalize fold bookkeeping (and any purge manifest
        # updates the marker carries) to the consolidated batch BEFORE
        # dropping the marker: a crash between the steps leaves the marker
        # in place, so the next recovery re-runs all idempotent steps.
        # (The reverse order left a window where folded still listed
        # pre-compaction batch numbers that the next append would reuse,
        # silently skipping their term_stats delta commits.)
        _apply_manifest_updates(layout, mk.get("manifest_updates", {}))
        _mark_folded_consolidated(layout)
        os.remove(marker)
        return "finished"
    leftovers = False
    for t in _all_tables(layout):
        if os.path.isdir(t + ".compact") or os.path.isdir(t + ".old"):
            leftovers = True
            _discard_staging(t)
    return "discarded" if leftovers else None


def _mark_folded_consolidated(layout: IndexLayout) -> None:
    """After a swap that renumbered postings to batch 0, the delta-finalize
    fold set must reference the consolidated batch only."""
    m = layout.read_manifest()
    fin = m.get("stages", {}).get("finalize")
    if fin and fin.get("done"):
        fin["folded"] = [0]
        layout.write_manifest(m)


def check_consistent(spark, layout: IndexLayout) -> None:
    """Fail fast when lineage references postings batches absent on disk
    (r2 ADVICE: a half-recovered state silently mis-drives orphan GC and
    resume).  Run AFTER recover_compaction; raises with a repair hint."""
    commits = {
        int(os.path.basename(d).split("-", 1)[1])
        for d in layout.list_commits(layout.postings)
    }
    lin = layout.read_lineage(spark)
    covered = {
        int(r["batch"])
        for r in lin.filter(lin.stage == "postings")
        .select("batch").distinct().collect()
    }
    missing = covered - commits
    if missing:
        raise RuntimeError(
            f"lineage references postings batches {sorted(missing)} absent "
            f"on disk at {layout.postings} — index is inconsistent; run "
            "compact_index (recovery sweep) or restore the missing commits "
            "before appending"
        )


def _purge_blocks_transform(tomb_by_case: dict):
    """mapInPandas transform: decode each posting block, drop tombstoned
    doc_ids, re-encode (payloads + per-block metadata + CRCs).  Per-BLOCK
    Python loop (<=128 postings each, same granularity as the query path's
    CRC loop); the delete set ships once per task and the membership test
    is a vectorized np.isin.  Blocks wholly untouched by the delete set
    pass through byte-identical (range fast-path, no decode)."""
    import zlib

    import numpy as np
    import pandas as pd

    from pysearch import codec
    from pysearch.schema import POSTING_BLOCKS

    cols = [f.name for f in POSTING_BLOCKS.fields]

    def run(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            out = {c: [] for c in cols}

            def emit(vals: dict):
                for c in cols:
                    out[c].append(vals[c])

            for row in pdf.to_dict("records"):
                excl = tomb_by_case.get(str(row["case_id"]))
                if (excl is None or row["max_doc_id"] < excl[0]
                        or row["min_doc_id"] > excl[-1]):
                    emit(row)
                    continue
                n = int(row["n"])
                ids, tfs, dls = codec.unpack_block(
                    n, row["doc_ids_bin"], row["tfs_bin"], row["dls_bin"])
                keep = np.isin(ids, excl, assume_unique=True, invert=True)
                if keep.all():
                    emit(row)
                    continue
                if not keep.any():
                    continue  # every posting deleted -> drop the block row
                ids2, tfs2, dls2 = ids[keep], tfs[keep], dls[keep]
                gaps = np.empty_like(ids2)
                gaps[0] = ids2[0]  # absolute base, block-local decode
                np.subtract(ids2[1:], ids2[:-1], out=gaps[1:])
                ib = codec.varint_encode(gaps.astype(np.uint64))
                tb = codec.varint_encode(tfs2.astype(np.uint64))
                db = codec.varint_encode(dls2.astype(np.uint64))
                pb, pcrc = row["pos_bin"], row["pos_crc32"]
                if pb is not None:
                    flat = codec.unpack_positions_batch(tfs, [pb])
                    ends = np.cumsum(tfs)
                    starts = ends - tfs
                    kept = [flat[s:e] for s, e, k in
                            zip(starts, ends, keep) if k]
                    pk = np.concatenate(kept)
                    t_off = np.zeros(tfs2.size, dtype=np.int64)
                    np.cumsum(tfs2[:-1], out=t_off[1:])
                    pg = np.empty_like(pk)
                    pg[0] = pk[0]
                    np.subtract(pk[1:], pk[:-1], out=pg[1:])
                    pg[t_off] = pk[t_off]  # absolute base per posting
                    pb = codec.varint_encode(pg.astype(np.uint64))
                    pcrc = zlib.crc32(pb)
                emit({
                    **row,
                    "n": int(ids2.size),
                    "doc_ids_bin": ib, "tfs_bin": tb, "dls_bin": db,
                    "min_doc_id": int(ids2[0]), "max_doc_id": int(ids2[-1]),
                    "max_tf": int(tfs2.max()), "min_dl": int(dls2.min()),
                    "sum_tf": int(tfs2.sum()),
                    "n_bytes": len(ib) + len(tb) + len(db)
                    + (len(pb) if pb is not None else 0),
                    "crc32": zlib.crc32(ib) ^ zlib.crc32(tb) ^ zlib.crc32(db),
                    "pos_bin": pb, "pos_crc32": pcrc,
                })
            yield pd.DataFrame(out, columns=cols)

    return run


def compact_index(spark, index_dir: str) -> dict:
    """Consolidate every multi-commit table of a COMPLETE index, and
    physically PURGE any pending tombstoned deletes (delete.delete_docs).

    Returns ``{table: n_commits_before}`` for the tables rewritten —
    including a ``"lineage"`` entry when only the lineage table needed
    consolidation, and ``"purged_docs"`` when a delete set was applied
    (empty dict == nothing to do at all).  Raises if the index is
    incomplete — compacting mid-build would race the builder's resume
    bookkeeping.

    The purge rewrites docs/doc_map without the deleted rows, re-encodes
    posting blocks without the deleted ids, recomputes term_stats AND
    corpus_stats exactly from the purged blocks (the same arithmetic as a
    fresh build's finalize, so post-purge scores are bit-identical to a
    fresh build of the surviving corpus — pinned by test), re-pins the
    manifest's per-case doc counts, and empties the tombstones table — all
    within the same crash-safe swap-marker window (the manifest updates
    ride in the marker and are replayed by recovery)."""
    from pyspark.sql import functions as F

    from pysearch.schema import DOCS, POSTING_BLOCKS, TERM_STATS

    layout = IndexLayout(index_dir)
    recover_compaction(layout)
    if not layout.stage_done("finalize"):
        raise RuntimeError(f"index at {index_dir} is not complete")

    tomb = layout.read_tombstones(spark) if layout.list_commits(
        layout.tombstones) else None
    tomb_pdf = tomb.toPandas() if tomb is not None else None
    purge = tomb_pdf is not None and len(tomb_pdf) > 0

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
        if n > 1 or purge:
            plan[t] = (schema, parts, sort, n)
    n_tstats = len(layout.list_commits(layout.term_stats))
    n_lineage = len(layout.list_commits(layout.lineage))
    if not plan and n_tstats <= 1 and n_lineage <= 1:
        return {}

    t0 = time.time()
    import numpy as np

    tomb_by_case = {}
    if purge:
        for cid, grp in tomb_pdf.groupby("case_id"):
            tomb_by_case[str(cid)] = np.unique(
                grp["doc_id"].to_numpy(np.int64))

    # 1. stage consolidated trees (heavy, restartable, index untouched)
    for t, (schema, parts, sort, _n) in plan.items():
        df = layout.read_commits(spark, t, schema=schema)
        if purge:
            if t == layout.postings:
                df = df.mapInPandas(_purge_blocks_transform(tomb_by_case),
                                    schema=POSTING_BLOCKS)
            else:
                anti = spark.createDataFrame(tomb_pdf)
                df = df.withColumn(
                    "case_id", F.col("case_id").cast("string")
                ).join(F.broadcast(anti), ["case_id", "doc_id"], "left_anti")
        (
            df.repartition(*parts)
            .sortWithinPartitions(*parts, *sort)
            .write.mode("overwrite")
            .partitionBy(*parts)
            .parquet(os.path.join(t + ".compact", "commit-00000"))
        )
    if purge:
        # exact stats recompute from the PURGED blocks — identical
        # arithmetic to build_finalize_stage (df=sum n, cf=sum sum_tf;
        # sum_dl = sum sum_tf per case; avgdl = sum_dl / n_docs as one
        # integer division), so a fresh build of the surviving corpus
        # produces bit-identical scores
        from pysearch.build import _term_stats_of

        staged = spark.read.parquet(
            os.path.join(layout.postings + ".compact", "commit-00000")
        ).withColumn("case_id", F.col("case_id").cast("string")).withColumn(
            "term_bucket", F.col("term_bucket").cast("int"))
        (
            _term_stats_of(staged)
            .repartition("term_bucket")
            .sortWithinPartitions("term_bucket", "case_id", "term")
            .write.mode("overwrite")
            .partitionBy("term_bucket")
            .parquet(os.path.join(layout.term_stats + ".compact",
                                  "commit-00000"))
        )
        staged_docs = spark.read.parquet(
            os.path.join(layout.docs + ".compact", "commit-00000")
        ).withColumn("case_id", F.col("case_id").cast("string"))
        counts = {
            str(r["case_id"]): int(r["n"]) for r in
            staged_docs.groupBy("case_id").agg(
                F.count("*").alias("n")).collect()
        }
        n_per_case = spark.createDataFrame(
            [(k, v) for k, v in counts.items()],
            schema="case_id string, n_docs long")
        dl_per_case = staged.groupBy("case_id").agg(
            F.sum("sum_tf").cast("long").alias("sum_dl"))
        (
            n_per_case.join(dl_per_case, "case_id", "left")
            .fillna({"sum_dl": 0})
            .withColumn("avgdl", F.col("sum_dl") / F.col("n_docs"))
            .filter(F.col("n_docs") > 0)
            .coalesce(1).write.mode("overwrite")
            .parquet(os.path.join(layout.corpus_stats + ".compact",
                                  "commit-00000"))
        )
        # empty staging for the tombstones table: the swap installs a
        # commit-less tree, i.e. "no pending deletes"
        os.makedirs(layout.tombstones + ".compact", exist_ok=True)
    elif n_tstats > 1:
        # delta finalize appends one stats commit per postings batch; the
        # consolidated table SUMS them (df/cf are additive per term)
        ts = layout.read_commits(spark, layout.term_stats, schema=TERM_STATS)
        (
            ts.groupBy("case_id", "term", "term_bucket")
            .agg(F.sum("df").cast("long").alias("df"),
                 F.sum("cf").cast("long").alias("cf"))
            .select("case_id", "term", "term_bucket", "df", "cf")
            .repartition("term_bucket")
            .sortWithinPartitions("term_bucket", "case_id", "term")
            .write.mode("overwrite")
            .partitionBy("term_bucket")
            .parquet(os.path.join(layout.term_stats + ".compact",
                                  "commit-00000"))
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

    # 3. commit point: write-ahead marker naming every table to swap, then
    #    the swaps themselves (cheap renames), then drop the marker.  A
    #    crash anywhere in this window is finished by recover_compaction —
    #    the marker makes the multi-table swap atomic-on-recovery.
    swap_tables = list(plan) + [layout.lineage]
    if purge:
        swap_tables += [layout.term_stats, layout.corpus_stats,
                        layout.tombstones]
    elif n_tstats > 1:
        swap_tables.append(layout.term_stats)
    updates = ({"case_counts": counts, "clear_tombstones": True}
               if purge else {})
    _write_marker(layout, [os.path.basename(t) for t in swap_tables],
                  manifest_updates=updates)
    for t in swap_tables:
        _finish_swap(t)
    # fold re-pin and purge manifest updates happen INSIDE the marker
    # window (all idempotent): a crash before the marker removal re-runs
    # them via recover_compaction, so the manifest can never pair a
    # consolidated postings table with a stale pre-compaction fold set or
    # pre-purge doc counts.
    _apply_manifest_updates(layout, updates)
    _mark_folded_consolidated(layout)
    os.remove(_marker_path(layout))
    out = {os.path.basename(t): n for t, (_s, _p, _sort, n) in plan.items()}
    if n_tstats > 1:
        out["term_stats"] = n_tstats
    if purge:
        out["purged_docs"] = int(len(tomb_pdf))
    if not out and n_lineage > 1:
        # lineage-only consolidation still rewrote a table — report it
        # (r2 ADVICE: '{}' here read as "nothing to compact" in the CLI)
        out["lineage"] = n_lineage
    return out
