"""spark-submit entry points: index / search / bench.

On a real cluster:

    zip -r pysearch.zip pysearch
    spark-submit --py-files pysearch.zip -m pysearch.cli index \\
        --input s3://bucket/webtext --output s3://bucket/index

(north_rule: the whole pipeline runs via spark-submit --py-files on
multi-executor clusters.)  Locally the session factory pins PYTHONPATH so the
same commands work without the zip.
"""

from __future__ import annotations

import argparse
import os
import sys
import zipfile


def make_pyfiles_zip(out_path: str = "pysearch.zip") -> str:
    """Package the library for spark-submit --py-files."""
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as z:
        for root, _dirs, files in os.walk(pkg_dir):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    rel = os.path.relpath(full, os.path.dirname(pkg_dir))
                    z.write(full, rel)
    return out_path


def cmd_index(args) -> None:
    from pysearch.build import build_index
    from pysearch.session import build_spark

    spark = build_spark(master=args.master, app_name="pysearch-index")
    df = spark.read.parquet(args.input)
    build_index(
        spark, df, args.output,
        segment_size=args.segment_size, n_buckets=args.buckets,
        resume=args.resume, analyzer=args.analyzer,
        store_positions=args.store_positions,
    )
    print(f"index built at {args.output}")
    spark.stop()


def cmd_search(args) -> None:
    from pysearch.query import Searcher
    from pysearch.session import build_spark

    spark = build_spark(master=args.master, app_name="pysearch-search")
    s = Searcher(spark, args.index, at_version=args.at_version)
    if args.arrivals:
        if args.filter or args.offset:
            raise SystemExit(
                "search: --filter/--offset are not supported with "
                "--arrivals (the NRT hybrid path has no filter context "
                "or pagination yet)")
        # NRT hybrid: index ∪ the unflushed arrival batch, combined stats
        from pysearch.streaming import search_with_arrivals

        batch = spark.read.parquet(args.arrivals)
        res = search_with_arrivals(
            s, batch, {"q": args.query}, k=args.k, case_id=args.case_id,
            mode=args.mode, prune=not args.no_prune)
        print(res[["url", "score"]].to_string(index=False))
    else:
        if args.offset:
            ids = s.search_ids(args.query, k=args.k, case_id=args.case_id,
                               prune=not args.no_prune, mode=args.mode,
                               window=args.window,
                               distance=args.fuzzy_distance,
                               filter=args.filter, offset=args.offset)
            print(ids.to_string(index=False))
        else:
            result = s.search(args.query, k=args.k, case_id=args.case_id,
                              prune=not args.no_prune, mode=args.mode,
                              window=args.window,
                              distance=args.fuzzy_distance,
                              filter=args.filter)
            result.show(args.k, truncate=80)
    spark.stop()


def cmd_count(args) -> None:
    from pysearch.query import Searcher
    from pysearch.session import build_spark

    spark = build_spark(master=args.master, app_name="pysearch-count")
    s = Searcher(spark, args.index)
    print(s.count(args.query, case_id=args.case_id, mode=args.mode,
                  window=args.window, filter=args.filter))
    spark.stop()


def cmd_suggest(args) -> None:
    from pysearch.query import Searcher
    from pysearch.session import build_spark

    spark = build_spark(master=args.master, app_name="pysearch-suggest")
    s = Searcher(spark, args.index)
    s.suggest(args.terms, case_id=args.case_id, max_edits=args.max_edits,
              top=args.top).orderBy("query_term", "dist", "suggestion") \
        .show(len(args.terms) * args.top, truncate=False)
    spark.stop()


def cmd_mlt(args) -> None:
    from pysearch.query import Searcher
    from pysearch.session import build_spark

    if not args.text and not args.text_file:
        raise SystemExit("mlt: one of --text / --text-file is required")
    spark = build_spark(master=args.master, app_name="pysearch-mlt")
    s = Searcher(spark, args.index)
    text = (open(args.text_file).read() if args.text_file
            else args.text)
    hits, sel = s.more_like_this(text, k=args.k, case_id=args.case_id,
                                 max_query_terms=args.max_query_terms,
                                 return_terms=True)
    print("query terms:", " ".join(sel))
    print(hits.to_string(index=False))
    spark.stop()


def cmd_package(args) -> None:
    print(make_pyfiles_zip(args.output))


def cmd_verify_index(args) -> None:
    """Offline consistency check (reference CheckConsistency analog,
    bleve_pdf.go:177-223): exits non-zero when the index is inconsistent."""
    from pysearch.session import build_spark
    from pysearch.verify import verify_index

    spark = build_spark(master=args.master, app_name="pysearch-verify")
    problems = verify_index(spark, args.index, check_crcs=not args.no_crc)
    spark.stop()
    if problems:
        for p in problems:
            print(f"FAIL: {p}")
        sys.exit(1)
    print(f"OK: index at {args.index} is consistent")


def cmd_compact_index(args) -> None:
    """Collapse accumulated append/streaming commit batches into one commit
    per table (read path goes back to one parquet scan per table)."""
    from pysearch.compact import compact_index
    from pysearch.session import build_spark

    spark = build_spark(master=args.master, app_name="pysearch-compact")
    done = compact_index(spark, args.index,
                         retain_previous=not args.no_retain)
    spark.stop()
    purged = done.pop("purged_docs", None)
    if purged is not None:
        print(f"purged {purged} tombstoned docs")
    if done:
        for table, n in sorted(done.items()):
            print(f"compacted {table}: {n} commits -> 1")
    elif purged is None:
        print("nothing to compact")


def cmd_snapshots(args) -> None:
    """List archived time-travelable snapshots (version, timestamp, doc
    count) — pure manifest reads, no Spark."""
    import json

    from pysearch.lineage import IndexLayout

    lay = IndexLayout(args.index)
    vs = lay.snapshots()
    if not vs:
        print("no snapshots")
        return
    for v in vs:
        with open(f"{lay.manifest_path}.v{v}") as f:
            m = json.load(f)
        n = m.get("stages", {}).get("docs", {}).get("n_docs", "?")
        pending = m.get("tombstones", {}).get("pending", 0)
        print(f"v{v}  ts={m.get('snapshot_ts', '?')}  n_docs={n}"
              + (f"  pending_deletes={pending}" if pending else ""))


def cmd_expire_generations(args) -> None:
    """Remove retained pre-current snapshot generations (no Spark needed —
    pure directory maintenance)."""
    from pysearch.compact import expire_generations
    from pysearch.lineage import IndexLayout

    removed = expire_generations(IndexLayout(args.index))
    if removed:
        for p in removed:
            print(f"expired {p}")
    else:
        print("nothing to expire")


def cmd_delete_docs(args) -> None:
    """Tombstone docs (by url list or SQL predicate) — suppressed from
    queries immediately, physically purged by the next compact-index."""
    from pysearch.delete import delete_docs
    from pysearch.session import build_spark

    spark = build_spark(master=args.master, app_name="pysearch-delete")
    n = delete_docs(
        spark, args.index,
        urls=args.url or None, predicate=args.predicate,
        case_id=args.case_id,
    )
    spark.stop()
    print(f"tombstoned {n} docs (run compact-index to purge physically)")


def main(argv=None) -> None:
    p = argparse.ArgumentParser(prog="pysearch")
    sub = p.add_subparsers(dest="cmd", required=True)

    pi = sub.add_parser("index", help="build an index from webtext parquet")
    pi.add_argument("--input", required=True)
    pi.add_argument("--output", required=True)
    pi.add_argument("--segment-size", type=int, default=4096)
    pi.add_argument("--buckets", type=int, default=64)
    pi.add_argument("--resume", action="store_true")
    pi.add_argument("--analyzer", default="en", choices=["en", "simple"])
    pi.add_argument("--store-positions", action="store_true",
                    help="store per-term token positions in posting blocks "
                         "and a token-offset sidecar on docs (index-side "
                         "phrase spans; larger index, one extra analyzer "
                         "pass at build)")
    pi.add_argument("--master", default=None)
    pi.set_defaults(fn=cmd_index)

    ps = sub.add_parser("search", help="top-k search over a built index")
    ps.add_argument("--index", required=True)
    ps.add_argument("--query", required=True)
    ps.add_argument("-k", type=int, default=10)
    ps.add_argument("--case-id", default="0")
    ps.add_argument("--no-prune", action="store_true")
    ps.add_argument("--mode", default="any",
                    choices=["any", "all", "phrase", "near", "boolean",
                             "fuzzy"],
                    help="match mode (boolean: Lucene '+must -not should' "
                         "syntax in the query string; fuzzy: 'term~d' "
                         "edit-distance, 'term*' prefix-wildcard and "
                         "'/regexp/' whole-term-regexp clauses; "
                         "phrase/near need a --store-positions index)")
    ps.add_argument("--fuzzy-distance", type=int, default=None,
                    help="mode=fuzzy default edit distance for query terms "
                         "without a ~d suffix (0-2)")
    ps.add_argument("--window", type=int, default=None,
                    help="mode=near proximity window: all distinct query "
                         "terms must co-occur within this many token "
                         "positions (any order)")
    ps.add_argument("--arrivals", default=None,
                    help="parquet path of an unflushed arrival batch: "
                         "NRT hybrid search over index ∪ batch "
                         "(combined stats; prints url/score)")
    ps.add_argument("--offset", type=int, default=0,
                    help="pagination: return ranks [offset, offset+k) of "
                         "the deterministic total order (ids+scores only)")
    ps.add_argument("--filter", default=None,
                    help="filter context: SQL predicate over the catalog "
                         "columns (doc_id, url, content_hash), e.g. "
                         "\"url like 'doc://docs/00%%'\"; only matching "
                         "docs can appear in results, BM25 stats stay "
                         "corpus-wide (Lucene filtered-query semantics)")
    ps.add_argument("--at-version", type=int, default=None,
                    help="time-travel: search the archived snapshot with "
                         "this version number (appends/deletes/compactions "
                         "since are invisible)")
    ps.add_argument("--master", default=None)
    ps.set_defaults(fn=cmd_search)

    pn = sub.add_parser("count",
                        help="total-hits count (no ranking materialized)")
    pn.add_argument("--index", required=True)
    pn.add_argument("--query", required=True)
    pn.add_argument("--case-id", default="0")
    pn.add_argument("--mode", default="any",
                    choices=["any", "all", "phrase", "near"])
    pn.add_argument("--window", type=int, default=None)
    pn.add_argument("--filter", default=None,
                    help="filter context (see search --filter)")
    pn.add_argument("--master", default=None)
    pn.set_defaults(fn=cmd_count)

    pg = sub.add_parser("suggest",
                        help="spelling suggestions from the index "
                             "vocabulary (Lucene DirectSpellChecker "
                             "analog)")
    pg.add_argument("--index", required=True)
    pg.add_argument("terms", nargs="+",
                    help="terms to correct (lowercased, un-analyzed)")
    pg.add_argument("--case-id", default="0")
    pg.add_argument("--max-edits", type=int, default=2)
    pg.add_argument("--top", type=int, default=3)
    pg.add_argument("--master", default=None)
    pg.set_defaults(fn=cmd_suggest)

    pm = sub.add_parser("mlt",
                        help="more-like-this: top-k docs similar to a "
                             "text (Lucene MoreLikeThis analog)")
    pm.add_argument("--index", required=True)
    pm.add_argument("--text", default=None, help="the source text inline")
    pm.add_argument("--text-file", default=None,
                    help="read the source text from a file instead")
    pm.add_argument("-k", type=int, default=10)
    pm.add_argument("--case-id", default="0")
    pm.add_argument("--max-query-terms", type=int, default=5)
    pm.add_argument("--master", default=None)
    pm.set_defaults(fn=cmd_mlt)

    def _run_bench(_args):
        import runpy

        repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        runpy.run_path(os.path.join(repo_root, "bench.py"), run_name="__main__")

    pb = sub.add_parser("bench", help="run the benchmark (one JSON line)")
    pb.set_defaults(fn=_run_bench)

    pv = sub.add_parser("verify-index", help="offline index consistency check")
    pv.add_argument("--index", required=True)
    pv.add_argument("--no-crc", action="store_true",
                    help="skip the block CRC pass (metadata checks only)")
    pv.add_argument("--master", default=None)
    pv.set_defaults(fn=cmd_verify_index)

    pc = sub.add_parser("compact-index",
                        help="collapse append commit batches into one")
    pc.add_argument("--index", required=True)
    pc.add_argument("--no-retain", action="store_true",
                    help="drop the superseded snapshot generation "
                    "immediately (default retains it so in-flight readers "
                    "survive the compaction)")
    pc.add_argument("--master", default=None)
    pc.set_defaults(fn=cmd_compact_index)

    psn = sub.add_parser(
        "snapshots",
        help="list archived time-travelable index snapshots")
    psn.add_argument("--index", required=True)
    psn.set_defaults(fn=cmd_snapshots)

    pe = sub.add_parser(
        "expire-generations",
        help="remove retained pre-current snapshot generations "
        "(Iceberg expire_snapshots analog; run in a maintenance window)")
    pe.add_argument("--index", required=True)
    pe.set_defaults(fn=cmd_expire_generations)

    pd_ = sub.add_parser(
        "delete-docs",
        help="tombstone docs out of a built index (purged at compaction)")
    pd_.add_argument("--index", required=True)
    pd_.add_argument("--url", action="append",
                     help="catalog url to delete (repeatable)")
    pd_.add_argument("--predicate",
                     help="SQL boolean over the docs table (case_id, "
                          "doc_id, url, content_hash, text)")
    pd_.add_argument("--case-id", default=None,
                     help="restrict the delete to one case")
    pd_.add_argument("--master", default=None)
    pd_.set_defaults(fn=cmd_delete_docs)

    pz = sub.add_parser("package", help="write pysearch.zip for --py-files")
    pz.add_argument("--output", default="pysearch.zip")
    pz.set_defaults(fn=cmd_package)

    args = p.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
