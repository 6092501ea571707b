"""Offline index consistency check — the analog of the reference's
``CheckConsistency`` (/root/reference/internal/doclib/bleve_pdf.go:177-223,
which validates catalog<->index agreement).

``verify_index`` cross-checks every table of a built index:

- manifest: present, format version, all stages marked done;
- docs: row count == manifest n_docs, doc_ids unique per case;
- doc_map: same (case, doc_id) set as docs;
- corpus_stats: per-case n_docs equals the docs table;
- postings: every commit dir covered by lineage and vice versa;
- term_stats: total df == total block posting count, total cf == total tf
  (the finalize aggregation invariants);
- block payloads: per-block CRC32 verification, distributed.

Returns a list of human-readable problems (empty == consistent).  All
checks are Spark aggregates over column-pruned scans except the CRC pass,
which reads the packed payloads (skippable via ``check_crcs=False``).
"""

from __future__ import annotations

import os
import zlib

import pandas as pd

from pysearch.lineage import IndexLayout
from pysearch.version import INDEX_FORMAT_VERSION


def verify_index(spark, index_dir: str, check_crcs: bool = True) -> list[str]:
    from pyspark.sql import functions as F

    from pysearch.schema import CORPUS_STATS, DOCS, POSTING_BLOCKS, TERM_STATS

    problems: list[str] = []
    layout = IndexLayout(index_dir)
    m = layout.read_manifest()
    if not m:
        return [f"no manifest at {layout.manifest_path}"]
    # staged-but-uncommitted compaction generations (trees NEWER than the
    # manifest's committed pointer) are leftovers of a crashed run —
    # harmless (unreferenced) but report them so operators sweep.  Trees
    # OLDER than the pointer are retained snapshots kept deliberately for
    # in-flight readers (compact.compact_index retain_previous) — not a
    # problem.
    from pysearch.lineage import TABLES

    for name in TABLES:
        cur = int(layout._generations().get(name, 0))
        for gen in layout.generation_paths(name):
            if gen > cur:
                problems.append(
                    f"uncommitted compaction generation {name}.g{gen} "
                    "(staged by a crashed run; recover_compaction clears it)"
                )
    # every ADVERTISED snapshot must be readable: a listed version whose
    # referenced generation trees/commits were removed outside the expiry
    # path (which prunes the manifest) is an inconsistency
    import json as _json

    for v in layout.snapshots():
        try:
            with open(f"{layout.manifest_path}.v{v}") as f:
                snap = _json.load(f)
        except (OSError, ValueError):
            problems.append(f"snapshot manifest v{v} unreadable")
            continue
        gens = snap.get("generations", {})
        for name, batches in snap.get("snapshot_commits", {}).items():
            if not batches:
                continue
            g = int(gens.get(name, 0))
            base = os.path.join(layout.root, name)
            d = base if g == 0 else f"{base}.g{g}"
            have = {
                int(c.split("-", 1)[1]) for c in (
                    os.listdir(d) if os.path.isdir(d) else [])
                if c.startswith("commit-")
            }
            missing = set(int(b) for b in batches) - have
            if missing:
                problems.append(
                    f"snapshot v{v} references missing commits "
                    f"{sorted(missing)} of {name} (gen {g}) — expired "
                    "outside expire_generations? prune_dangling_snapshots "
                    "repairs the listing"
                )
    if m.get("format_version") != INDEX_FORMAT_VERSION:
        problems.append(
            f"format_version {m.get('format_version')} != {INDEX_FORMAT_VERSION}"
        )
    for stage in ("docs", "postings", "finalize"):
        if not layout.stage_done(stage):
            problems.append(f"stage {stage!r} not marked done")
    if problems:
        return problems  # table checks assume a complete build

    docs = layout.read_commits(spark, layout.docs, schema=DOCS).withColumn(
        "case_id", F.col("case_id").cast("string")
    )
    doc_map = layout.read_commits(spark, layout.doc_map, schema=DOCS).withColumn(
        "case_id", F.col("case_id").cast("string")
    )
    blocks = layout.read_commits(
        spark, layout.postings, schema=POSTING_BLOCKS
    ).withColumn("case_id", F.col("case_id").cast("string"))
    stats = layout.read_commits(spark, layout.corpus_stats, schema=CORPUS_STATS)
    tstats = layout.read_commits(spark, layout.term_stats, schema=TERM_STATS)

    # docs count vs manifest
    n_docs = docs.count()
    n_manifest = m.get("stages", {}).get("docs", {}).get("n_docs")
    if n_manifest is not None and n_docs != int(n_manifest):
        problems.append(f"docs rows {n_docs} != manifest n_docs {n_manifest}")

    # doc_id uniqueness per case
    dup = (
        docs.groupBy("case_id", "doc_id").count()
        .filter(F.col("count") > 1).count()
    )
    if dup:
        problems.append(f"{dup} duplicate (case_id, doc_id) keys in docs")

    # doc_map <-> docs agreement (same key set)
    keys_d = docs.select("case_id", "doc_id")
    keys_m = doc_map.select("case_id", "doc_id")
    missing = keys_d.exceptAll(keys_m).count()
    extra = keys_m.exceptAll(keys_d).count()
    if missing or extra:
        problems.append(
            f"doc_map out of sync with docs: {missing} missing, {extra} extra"
        )

    # corpus_stats per-case n_docs
    per_case = {
        str(r["case_id"]): int(r["n"])
        for r in docs.groupBy("case_id").agg(F.count("*").alias("n")).collect()
    }
    for r in stats.collect():
        want = per_case.get(str(r["case_id"]))
        if want != int(r["n_docs"]):
            problems.append(
                f"corpus_stats case {r['case_id']}: n_docs {r['n_docs']} != docs {want}"
            )

    # postings commits <-> lineage coverage (both directions)
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
    if commits - covered:
        problems.append(f"postings commits without lineage: {sorted(commits - covered)}")
    if covered - commits:
        problems.append(f"lineage references missing postings commits: {sorted(covered - commits)}")

    # term_stats aggregation invariants (finalize correctness)
    b = blocks.agg(
        F.coalesce(F.sum("n"), F.lit(0)).alias("df"),
        F.coalesce(F.sum("sum_tf"), F.lit(0)).alias("cf"),
    ).collect()[0]
    t = tstats.agg(
        F.coalesce(F.sum("df"), F.lit(0)).alias("df"),
        F.coalesce(F.sum("cf"), F.lit(0)).alias("cf"),
    ).collect()[0]
    if int(b["df"]) != int(t["df"]) or int(b["cf"]) != int(t["cf"]):
        problems.append(
            f"term_stats totals (df={t['df']}, cf={t['cf']}) != "
            f"block totals (df={b['df']}, cf={b['cf']})"
        )

    if check_crcs:
        has_pos = "pos_bin" in blocks.columns

        def check(batches):
            for pdf in batches:
                bad = 0
                for ib, tb, db, crc in zip(pdf["doc_ids_bin"], pdf["tfs_bin"],
                                           pdf["dls_bin"], pdf["crc32"]):
                    got = zlib.crc32(ib) ^ zlib.crc32(tb) ^ zlib.crc32(db)
                    if got != crc:
                        bad += 1
                if "pos_bin" in pdf.columns:
                    for pb, pcrc in zip(pdf["pos_bin"], pdf["pos_crc32"]):
                        if pb is not None and zlib.crc32(pb) != pcrc:
                            bad += 1
                yield pd.DataFrame({"bad": [bad]})

        cols = ["doc_ids_bin", "tfs_bin", "dls_bin", "crc32"]
        if has_pos:
            cols += ["pos_bin", "pos_crc32"]
        bad = (
            blocks.select(*cols)
            .mapInPandas(check, schema="bad long")
            .agg(F.coalesce(F.sum("bad"), F.lit(0)).alias("bad"))
            .collect()[0]["bad"]
        )
        if bad:
            problems.append(f"{bad} posting blocks failed CRC32 verification")

        # token-offset sidecar CRCs (store_positions builds only)
        if "offs_crc32" in docs.columns and m.get("positions"):
            def check_offs(batches):
                for pdf in batches:
                    bad = 0
                    for sb, lb, crc in zip(pdf["tok_starts_bin"],
                                           pdf["tok_lens_bin"],
                                           pdf["offs_crc32"]):
                        if sb is None:
                            bad += 1  # positions index must carry offsets
                        elif zlib.crc32(sb) ^ zlib.crc32(lb) != crc:
                            bad += 1
                    yield pd.DataFrame({"bad": [bad]})

            bad_o = (
                docs.select("tok_starts_bin", "tok_lens_bin", "offs_crc32")
                .mapInPandas(check_offs, schema="bad long")
                .agg(F.coalesce(F.sum("bad"), F.lit(0)).alias("bad"))
                .collect()[0]["bad"]
            )
            if bad_o:
                problems.append(
                    f"{bad_o} docs failed token-offset sidecar verification"
                )

    return problems
