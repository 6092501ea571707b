"""Index manifest, batch commits, and per-partition lineage/metrics.

The reference's durability story is a periodically-flushed JSON catalog plus
CRC-checked sidecar files (/root/reference/internal/doclib/file_desc.go:15-35,
doc_positions.go:138-169,222-226).  Ours is checkpointed, resumable builds
(north_rule): every build stage commits atomically (write to a temp dir,
``os.rename`` into place — the local-parquet stand-in for an Iceberg snapshot
commit), and the postings stage records one lineage row per (case, segment)
so a resumed build constructs only the missing segments.
"""

from __future__ import annotations

import datetime as _dt
import json
import os
import shutil
import uuid


def _utcnow():
    return _dt.datetime.now(_dt.timezone.utc)


def _has_parquet(commit_dir: str) -> bool:
    for _root, _dirs, files in os.walk(commit_dir):
        if any(f.endswith(".parquet") for f in files):
            return True
    return False


#: logical table names of an index, in no particular order
TABLES = ("docs", "doc_map", "postings", "term_stats", "corpus_stats",
          "lineage", "tombstones")


class IndexLayout:
    """Path layout + manifest of one index directory.

    Table paths are **generation-aware**: the manifest's ``generations``
    map records each table's current generation (absent == 0).  Generation
    0 lives at ``<root>/<table>``; generation N>=1 at ``<root>/<table>.gN``.
    Compaction stages consolidated trees as the NEXT generation and commits
    them with a single atomic manifest write (the local-parquet analog of
    an Iceberg snapshot commit) — prior generations stay on disk until
    ``expire_generations``, so readers whose plans resolved files under an
    older generation keep working through a compaction (snapshot
    isolation; see pysearch.compact)."""

    def __init__(self, root: str, at_version: int | None = None):
        """``at_version`` pins this layout READ-ONLY to an archived
        snapshot (``commit_snapshot``): the manifest, generation pointers,
        and per-table commit sets are the ones recorded at that version —
        Iceberg time-travel.  Mutating methods raise.  A pinned snapshot
        stays readable as long as the generations/commits it references
        exist on disk (appends are additive and compaction retains the
        superseded generation, so recent snapshots survive; see
        ``compact.expire_generations``)."""
        self.root = root
        self.manifest_path = os.path.join(root, "manifest.json")
        self._manifest_stat = None
        self._gens: dict = {}
        self.at_version = None if at_version is None else int(at_version)
        self._pinned: dict | None = None
        if self.at_version is not None:
            p = f"{self.manifest_path}.v{self.at_version}"
            if not os.path.exists(p):
                raise FileNotFoundError(
                    f"no snapshot v{self.at_version} at {self.root} "
                    f"(available: {self.snapshots() or 'none'})"
                )
            with open(p) as f:
                self._pinned = json.load(f)

    def snapshots(self) -> list[int]:
        """Versions with an archived manifest, ascending."""
        prefix = os.path.basename(self.manifest_path) + ".v"
        if not os.path.isdir(self.root):
            return []
        return sorted(
            int(d[len(prefix):]) for d in os.listdir(self.root)
            if d.startswith(prefix) and d[len(prefix):].isdigit()
        )

    def _assert_mutable(self) -> None:
        if self._pinned is not None:
            raise RuntimeError(
                f"layout is pinned read-only to snapshot v{self.at_version} "
                f"of {self.root}; construct without at_version to mutate"
            )

    def commit_snapshot(self, manifest: dict | None = None) -> int:
        """Record the current COMPLETE index state as an immutable numbered
        snapshot (the Iceberg snapshot-log analog): stamps the manifest
        with ``snapshot_version`` and the per-table commit sets it covers,
        writes it (atomic — THE commit point for callers that pass their
        mutated ``manifest``), and archives a copy as
        ``manifest.json.v<N>`` for time-travel reads
        (``IndexLayout(root, at_version=N)``).  Called at every mutation
        commit point: build/append finalize, delete_docs, compact_index."""
        import shutil as _sh

        self._assert_mutable()
        m = self.read_manifest() if manifest is None else manifest
        v = int(m.get("snapshot_version", 0)) + 1
        m["snapshot_version"] = v
        m["snapshot_ts"] = _utcnow().isoformat()
        gens = m.get("generations", {})
        commits = {}
        for name in TABLES:
            g = int(gens.get(name, 0))
            base = os.path.join(self.root, name)
            d = base if g == 0 else f"{base}.g{g}"
            commits[name] = [
                int(c.split("-", 1)[1]) for c in sorted(os.listdir(d))
                if c.startswith("commit-")
            ] if os.path.isdir(d) else []
        m["snapshot_commits"] = commits
        self.write_manifest(m)
        _sh.copyfile(self.manifest_path, f"{self.manifest_path}.v{v}")
        return v

    def bump_generation(self, name: str, gen: int) -> None:
        """Point ``name`` at generation ``gen`` (atomic manifest write).
        The caller must have fully written the new generation tree first —
        before this write it is invisible (recovery discards trees newer
        than the committed pointer)."""
        self.bump_generations({name: gen})

    def bump_generations(self, gens: dict) -> None:
        """Flip SEVERAL tables' generation pointers in ONE atomic manifest
        write.  Tables whose new trees must become visible together (e.g.
        term_stats + corpus_stats after a stats recompute — df must never
        exceed n_docs under any reader's frozen generation map) go through
        here; two sequential ``bump_generation`` calls would expose the
        mixed state to a reader loading between them."""
        self._assert_mutable()
        m = self.read_manifest()
        g = m.setdefault("generations", {})
        for name, gen in gens.items():
            g[name] = int(gen)
        self.write_manifest(m)

    def _generations(self) -> dict:
        """Current per-table generation map, cached on the manifest stat
        (every index mutation rewrites the manifest via atomic replace)."""
        if self._pinned is not None:
            return self._pinned.get("generations", {})
        try:
            st = os.stat(self.manifest_path)
            sig = (st.st_mtime_ns, st.st_size)
        except FileNotFoundError:
            sig = None
        if sig != self._manifest_stat:
            self._gens = self.read_manifest().get("generations", {})
            self._manifest_stat = sig
        return self._gens

    def table_path(self, name: str, gen: int | None = None) -> str:
        """Path of ``name``'s generation ``gen`` (default: current)."""
        if gen is None:
            gen = int(self._generations().get(name, 0))
        base = os.path.join(self.root, name)
        return base if gen == 0 else f"{base}.g{gen}"

    def generation_paths(self, name: str) -> dict[int, str]:
        """All on-disk generation trees of ``name``, as {gen: path}."""
        out = {}
        base = os.path.join(self.root, name)
        if os.path.isdir(base):
            out[0] = base
        prefix = f"{name}.g"
        if os.path.isdir(self.root):
            for d in os.listdir(self.root):
                if d.startswith(prefix) and d[len(prefix):].isdigit():
                    out[int(d[len(prefix):])] = os.path.join(self.root, d)
        return out

    @property
    def docs(self) -> str:
        return self.table_path("docs")

    @property
    def doc_map(self) -> str:
        return self.table_path("doc_map")

    @property
    def postings(self) -> str:
        return self.table_path("postings")

    @property
    def term_stats(self) -> str:
        return self.table_path("term_stats")

    @property
    def corpus_stats(self) -> str:
        return self.table_path("corpus_stats")

    @property
    def lineage(self) -> str:
        return self.table_path("lineage")

    @property
    def tombstones(self) -> str:
        return self.table_path("tombstones")

    def read_tombstones(self, spark):
        """The pending (case_id, doc_id) delete set — empty DataFrame when
        no deletes are outstanding (table absent or emptied by compaction)."""
        from pysearch.schema import TOMBSTONES

        if not self.list_commits(self.tombstones):
            return spark.createDataFrame([], schema=TOMBSTONES)
        return self.read_commits(spark, self.tombstones, schema=TOMBSTONES)

    # -- manifest ---------------------------------------------------------
    def read_manifest(self) -> dict:
        if self._pinned is not None:
            return json.loads(json.dumps(self._pinned))  # callers mutate
        if not os.path.exists(self.manifest_path):
            return {}
        with open(self.manifest_path) as f:
            return json.load(f)

    def write_manifest(self, manifest: dict) -> None:
        self._assert_mutable()
        os.makedirs(self.root, exist_ok=True)
        tmp = self.manifest_path + f".tmp.{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            json.dump(manifest, f, indent=2, sort_keys=True, default=str)
        os.replace(tmp, self.manifest_path)

    def mark_stage(self, stage: str, **info) -> None:
        m = self.read_manifest()
        stages = m.setdefault("stages", {})
        stages[stage] = {"done": True, "ts": _utcnow().isoformat(), **info}
        self.write_manifest(m)

    def stage_done(self, stage: str) -> bool:
        return bool(self.read_manifest().get("stages", {}).get(stage, {}).get("done"))

    def clear_stage(self, stage: str) -> None:
        """Unset a stage's done flag (append invalidates postings/finalize
        before committing new docs, so a crashed append resumes cleanly)."""
        m = self.read_manifest()
        if m.get("stages", {}).get(stage):
            m["stages"][stage]["done"] = False
            self.write_manifest(m)

    # -- atomic batch commits --------------------------------------------
    def staging_dir(self, table: str) -> str:
        return os.path.join(self.root, f"_tmp_{table}_{uuid.uuid4().hex}")

    def commit_batch(self, staging: str, table_dir: str, batch: int,
                     replace: bool = False) -> str:
        """Atomically move a written staging dir to <table>/commit-<n>.

        Plain (non key=value) names so Spark partition discovery under each
        commit root sees only the table's real partition columns.
        ``replace=True`` overwrites a stale dir left by a crash between a
        stage's commit and its manifest mark (stage reruns are whole-stage,
        so the stale data is unreferenced)."""
        self._assert_mutable()
        os.makedirs(table_dir, exist_ok=True)
        final = os.path.join(table_dir, f"commit-{batch:05d}")
        if os.path.exists(final):
            if not replace:
                raise RuntimeError(f"commit dir already exists: {final}")
            shutil.rmtree(final)
        os.rename(staging, final)
        return final

    def gc_orphan_postings_commits(self, spark) -> list[str]:
        """Remove postings commit dirs not covered by lineage.

        The lineage append is the postings commit point: a crash between the
        directory rename and the lineage write leaves an orphan batch whose
        segments would otherwise be rebuilt on resume and double-counted.
        """
        commits = self.list_commits(self.postings)
        if not commits:
            return []
        lin = self.read_lineage(spark)
        covered = {
            int(r["batch"])
            for r in lin.filter(lin.stage == "postings")
            .select("batch").distinct().collect()
        }
        removed = []
        for d in commits:
            batch = int(os.path.basename(d).split("-", 1)[1])
            if batch not in covered:
                shutil.rmtree(d, ignore_errors=True)
                removed.append(d)
        return removed

    def gc_orphan_docs_commits(self, spark) -> list[str]:
        """Remove appended docs commit dirs (batch > 0) not covered by a
        docs lineage row — the append analog of the postings orphan GC
        (the lineage append is the commit point for a docs batch).  The
        paired doc_map batch is removed with it (it commits between the
        docs commit and the lineage append, so it can never be covered
        when the docs batch isn't)."""
        commits = self.list_commits(self.docs)
        if len(commits) <= 1:
            return []
        lin = self.read_lineage(spark)
        covered = {
            int(r["batch"])
            for r in lin.filter(lin.stage == "docs")
            .select("batch").distinct().collect()
        }
        removed = []
        for d in commits:
            batch = int(os.path.basename(d).split("-", 1)[1])
            if batch > 0 and batch not in covered:
                shutil.rmtree(d, ignore_errors=True)
                removed.append(d)
                dm = os.path.join(self.doc_map, f"commit-{batch:05d}")
                if os.path.isdir(dm):
                    shutil.rmtree(dm, ignore_errors=True)
                    removed.append(dm)
        return removed

    def next_batch(self, table_dir: str) -> int:
        if not os.path.isdir(table_dir):
            return 0
        existing = [
            int(d.split("-", 1)[1])
            for d in os.listdir(table_dir)
            if d.startswith("commit-")
        ]
        return max(existing) + 1 if existing else 0

    def list_commits(self, table_dir: str) -> list[str]:
        if not os.path.isdir(table_dir):
            return []
        out = sorted(
            os.path.join(table_dir, d)
            for d in os.listdir(table_dir)
            if d.startswith("commit-")
        )
        if self._pinned is not None:
            # time-travel: only the commit batches recorded at snapshot
            # time exist in this view (commits appended SINCE are invisible
            # — they live in the same generation dir)
            name = os.path.basename(table_dir)
            if ".g" in name:
                name = name.rsplit(".g", 1)[0]
            allowed = set(
                self._pinned.get("snapshot_commits", {}).get(name, []))
            out = [
                d for d in out
                if int(os.path.basename(d).split("-", 1)[1]) in allowed
            ]
        return out

    def read_commits(self, spark, table_dir: str, schema=None):
        """Read a table as the union of its committed batches.

        Each commit dir is read as its own single-root parquet tree (so
        partition discovery inside a commit — e.g. term_bucket=K — stays
        consistent), then unioned by name; Spark cannot partition-discover
        across multiple commit roots in one read.

        Commit dirs with no part files (an empty partitioned write leaves
        only _SUCCESS) are skipped — with ``schema`` given, a table whose
        commits are all empty reads as an empty DataFrame instead of a
        schema-inference error (empty-corpus builds)."""
        dirs = [d for d in self.list_commits(table_dir) if _has_parquet(d)]
        if not dirs:
            if schema is not None:
                return spark.createDataFrame([], schema=schema)
            raise FileNotFoundError(f"no readable commits under {table_dir}")
        out = None
        for d in dirs:
            part = spark.read.parquet(d)
            out = part if out is None else out.unionByName(part)
        return out

    def gc_staging(self) -> None:
        if not os.path.isdir(self.root):
            return
        for d in os.listdir(self.root):
            if d.startswith("_tmp_"):
                shutil.rmtree(os.path.join(self.root, d), ignore_errors=True)

    # -- lineage ----------------------------------------------------------
    def append_lineage(self, spark, rows: list[dict]) -> None:
        """Append lineage rows as an atomic batch.

        Written driver-side with pyarrow (the rows are a small driver-side
        list — a Spark job per lineage append was pure fixed overhead, and
        builds do several of them).  The arrow schema mirrors
        pysearch.schema.LINEAGE so Spark reads all commits uniformly."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        self._assert_mutable()
        if not rows:
            return
        now = _utcnow()
        schema = pa.schema([
            ("stage", pa.string()),
            ("partition_key", pa.string()),
            ("batch", pa.int32()),
            ("status", pa.string()),
            ("n_rows", pa.int64()),
            ("n_postings", pa.int64()),
            ("bytes", pa.int64()),
            ("wall_sec", pa.float64()),
            ("ts", pa.timestamp("us", tz="UTC")),
        ])
        cols = {
            "stage": [r["stage"] for r in rows],
            "partition_key": [r["partition_key"] for r in rows],
            "batch": [int(r.get("batch", 0)) for r in rows],
            "status": [r.get("status", "done") for r in rows],
            "n_rows": [r.get("n_rows") for r in rows],
            "n_postings": [r.get("n_postings") for r in rows],
            "bytes": [r.get("bytes") for r in rows],
            "wall_sec": [r.get("wall_sec") for r in rows],
            "ts": [now] * len(rows),
        }
        staging = self.staging_dir("lineage")
        os.makedirs(staging, exist_ok=True)
        pq.write_table(pa.Table.from_pydict(cols, schema=schema),
                       os.path.join(staging, "part-00000.parquet"))
        self.commit_batch(staging, self.lineage, self.next_batch(self.lineage))

    def read_lineage(self, spark):
        from pysearch.schema import LINEAGE

        return self.read_commits(spark, self.lineage, schema=LINEAGE)

    def done_partitions(self, spark, stage: str) -> set:
        df = self.read_lineage(spark)
        rows = (
            df.filter((df.stage == stage) & (df.status == "done"))
            .select("partition_key")
            .distinct()
            .collect()
        )
        return {r.partition_key for r in rows}
