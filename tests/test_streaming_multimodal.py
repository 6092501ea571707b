"""Streaming micro-index (watch-terms) and multimodal plumbing tests."""

import os
import shutil

import pytest

from pysearch import corpus


@pytest.fixture(scope="module")
def stream_src(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("stream_src"))
    df = corpus.webtext_df(spark, cases=[(6, "in the realm of", 100, 200)])
    df.write.mode("overwrite").parquet(d)
    return d, df.schema


def test_watch_terms_stream(spark, stream_src):
    from pysearch.streaming import watch_terms_stream

    d, schema = stream_src
    stream = spark.readStream.schema(schema).parquet(d)
    matches = watch_terms_stream(stream, ["in the realm of"])
    q = (
        matches.writeStream.format("memory").queryName("wt_out")
        .outputMode("append").start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    rows = spark.sql("SELECT url, term FROM wt_out").collect()
    got = sorted(int(r.url.rsplit("/", 1)[1]) for r in rows)
    want = [i for i in range(1, 101) if i % 3 != 2]
    assert got == want
    assert {r.term for r in rows} == {"realm"}


def test_windowed_term_counts(spark, stream_src):
    from pysearch.streaming import windowed_term_counts

    d, schema = stream_src
    stream = spark.readStream.schema(schema).parquet(d)
    agg = windowed_term_counts(stream, ["in the realm of"], window="1 minute")
    q = (
        agg.writeStream.format("memory").queryName("wc_out")
        .outputMode("complete").start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    rows = spark.sql("SELECT * FROM wc_out ORDER BY window_start").collect()
    assert sum(r.n_docs for r in rows) == 67  # docs 1..100 with i%3 != 2
    assert all(r.term == "realm" for r in rows)
    # warc_ts = epoch + i sec -> docs span 100s -> 2 one-minute windows
    assert len(rows) == 2


def test_foreach_batch_matcher(spark, stream_src, tmp_path):
    from pysearch.streaming import foreach_batch_matcher

    d, schema = stream_src
    out = str(tmp_path / "matches")
    stream = spark.readStream.schema(schema).parquet(d)
    q = (
        stream.writeStream.foreachBatch(foreach_batch_matcher(["realm"], out))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = spark.read.parquet(out).count()
    assert got == 67


def test_foreach_batch_indexer(spark, tmp_path):
    """Streaming ingestion into a persistent index: two micro-batches (two
    parquet files, maxFilesPerTrigger=1) append-build one index; searches
    see documents from both, and ranks match a one-shot batch build."""
    from pysearch.query import Searcher
    from pysearch.streaming import foreach_batch_indexer

    src = str(tmp_path / "ingest_src")
    df = corpus.webtext_df(spark, cases=[(6, "in the realm of", 100, 200)])
    df.filter("url <= 'doc://6/0050'").coalesce(1).write.mode(
        "overwrite").parquet(src)
    df.filter("url > 'doc://6/0050'").coalesce(1).write.mode(
        "append").parquet(src)

    ix = str(tmp_path / "ingest_ix")
    stream = (
        spark.readStream.schema(df.schema)
        .option("maxFilesPerTrigger", "1").parquet(src)
    )
    q = (
        stream.writeStream
        .foreachBatch(foreach_batch_indexer(ix, segment_size=16))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    s = Searcher(spark, ix)
    hits = s.search_ids("in the realm of", k=100, case_id="6")
    url_of = {r["doc_id"]: r["url"]
              for r in s.docs.select("doc_id", "url").collect()}
    got = sorted(int(url_of[i].rsplit("/", 1)[1]) for i in hits["doc_id"])
    assert got == [i for i in range(1, 101) if i % 3 != 2]
    # score multiset matches a one-shot batch build of the same corpus
    ix2 = str(tmp_path / "oneshot_ix")
    from pysearch.build import build_index

    build_index(spark, df, ix2, segment_size=16)
    fresh = Searcher(spark, ix2).search_ids("in the realm of", k=100,
                                            case_id="6")
    assert sorted(hits["score"]) == sorted(fresh["score"])


def test_scored_arrival_matches_engine(spark, tmp_path):
    """The scored in-memory arrival index (reference use case 2: short-lived
    in-memory index over arriving docs) is rank- AND score-identical to
    building a real persistent index over the same batch and searching it —
    including the P3/P4 dedupe rules and conjunctive mode."""
    from pyspark.sql import functions as F

    from pysearch.build import build_index
    from pysearch.query import Searcher
    from pysearch.streaming import score_arriving_batch

    batch = corpus.webtext_df(spark, cases=[(6, "in the realm of", 60, 200)])
    # duplicate rows exercise the dedupe parity (engine drops them too)
    batch = batch.unionByName(batch.limit(5))
    # q3/q4 exercise phrase adjacency: "full text search" occurs adjacently
    # in the corpus, while q4's terms co-occur but (reversed) are never
    # adjacent — under mode="phrase" the two must diverge from mode="all"
    queries = {"q0": "in the realm of", "q1": "realm", "q2": "banana",
               "q3": "full text search", "q4": "search text full"}

    engine_hits = {}
    for mode in ("any", "all", "phrase"):
        res = score_arriving_batch(batch, queries, k=10, mode=mode)
        got = {
            qid: [(r["url"], r["score"]) for r in rows]
            for qid, rows in __import__("itertools").groupby(
                res.collect(), key=lambda r: r["qid"]
            )
        }
        ix = str(tmp_path / f"arrival_ix_{mode}")
        build_index(spark, batch, ix, segment_size=16,
                    store_positions=(mode == "phrase"))
        s = Searcher(spark, ix)
        url_of = {r["doc_id"]: r["url"]
                  for r in s.docs.select("doc_id", "url").collect()}
        for qid, q in queries.items():
            hits = s.search_ids(q, k=10, case_id="6", mode=mode)
            want = [(url_of[i], float(sc))
                    for i, sc in zip(hits["doc_id"], hits["score"])]
            assert got.get(qid, []) == want, (mode, qid)
            engine_hits[(mode, qid)] = want
    # the adjacency gate must have BITTEN: q3 ranks under phrase == its
    # conjunctive ranks (every conjunctive hit contains the adjacent run in
    # this corpus), while q4 (same terms, impossible order) drops to empty
    assert engine_hits[("phrase", "q3")] == engine_hits[("all", "q3")]
    assert engine_hits[("all", "q4")] and not engine_hits[("phrase", "q4")]


def test_scored_arrival_html_only_rows(spark, tmp_path):
    """r3 ADVICE: micro-batches with html-only rows (text IS NULL) must go
    through the same S4 text extraction as the persistent-index path — the
    arrival scorer may not silently drop documents build_docs_stage would
    index and rank."""
    from pyspark.sql import functions as F

    from pysearch.build import build_index
    from pysearch.query import Searcher
    from pysearch.streaming import score_arriving_batch

    batch = corpus.webtext_df(spark, cases=[(6, "in the realm of", 40, 200)])
    # null out text on half the rows: those docs exist only as html
    batch = batch.withColumn(
        "text",
        F.when(F.col("url").substr(-1, 1).isin("0", "2", "4", "6", "8"),
               F.col("text")),
    )
    queries = {"q0": "in the realm of", "q1": "realm"}
    res = score_arriving_batch(batch, queries, k=15)
    got = {
        qid: [(r["url"], r["score"]) for r in rows]
        for qid, rows in __import__("itertools").groupby(
            res.collect(), key=lambda r: r["qid"]
        )
    }
    ix = str(tmp_path / "arrival_html_ix")
    build_index(spark, batch, ix, segment_size=16)
    s = Searcher(spark, ix)
    url_of = {r["doc_id"]: r["url"]
              for r in s.docs.select("doc_id", "url").collect()}
    for qid, q in queries.items():
        hits = s.search_ids(q, k=15, case_id="6")
        want = [(url_of[i], float(sc))
                for i, sc in zip(hits["doc_id"], hits["score"])]
        assert len(want) > 10  # proves html-only docs are being ranked
        assert got.get(qid, []) == want, qid


def test_foreach_batch_scored_matcher(spark, tmp_path):
    """Streaming plumbing for the scored arrival index: per-epoch top-k
    parquet, each epoch scored against its own batch only."""
    import glob

    from pysearch.streaming import foreach_batch_scored_matcher

    src = str(tmp_path / "arrival_src")
    df = corpus.webtext_df(spark, cases=[(6, "in the realm of", 40, 200)])
    df.filter("url <= 'doc://6/0020'").coalesce(1).write.mode(
        "overwrite").parquet(src)
    df.filter("url > 'doc://6/0020'").coalesce(1).write.mode(
        "append").parquet(src)

    out = str(tmp_path / "arrival_out")
    stream = (
        spark.readStream.schema(df.schema)
        .option("maxFilesPerTrigger", "1").parquet(src)
    )
    q = (
        stream.writeStream
        .foreachBatch(foreach_batch_scored_matcher(
            {"q0": "in the realm of"}, out, k=5))
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    epochs = sorted(glob.glob(f"{out}/epoch=*"))
    assert len(epochs) == 2
    res = spark.read.parquet(out)
    rows = res.collect()
    assert {r["qid"] for r in rows} == {"q0"}
    per_epoch = {}
    for r in rows:
        per_epoch.setdefault(r["epoch"], set()).add(r["url"])
    assert all(len(v) == 5 for v in per_epoch.values())
    # batches are disjoint url ranges -> so are their per-epoch hits
    eps = sorted(per_epoch)
    assert per_epoch[eps[0]].isdisjoint(per_epoch[eps[1]])


def test_foreach_batch_indexer_auto_compaction(spark, tmp_path):
    """A long-running ingest stream stays bounded: with compact_every=2 the
    sink compacts in-line whenever postings commits exceed the cap, so the
    commit count never grows with stream lifetime (the r2 scale flaw) — and
    ranks still match a one-shot batch build of the same corpus."""
    from pysearch.lineage import IndexLayout
    from pysearch.query import Searcher
    from pysearch.streaming import foreach_batch_indexer

    src = str(tmp_path / "ingest_src")
    df = corpus.webtext_df(spark, cases=[(6, "in the realm of", 80, 200)])
    bounds = ["doc://6/0020", "doc://6/0040", "doc://6/0060"]
    splits = [
        df.filter(f"url <= '{bounds[0]}'"),
        df.filter(f"url > '{bounds[0]}' and url <= '{bounds[1]}'"),
        df.filter(f"url > '{bounds[1]}' and url <= '{bounds[2]}'"),
        df.filter(f"url > '{bounds[2]}'"),
    ]
    for i, part in enumerate(splits):
        part.coalesce(1).write.mode("overwrite" if i == 0 else "append"
                                    ).parquet(src)

    ix = str(tmp_path / "ingest_ix")
    stream = (
        spark.readStream.schema(df.schema)
        .option("maxFilesPerTrigger", "1").parquet(src)
    )
    q = (
        stream.writeStream
        .foreachBatch(foreach_batch_indexer(ix, compact_every=2,
                                            segment_size=16))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    lay = IndexLayout(ix)
    assert len(lay.list_commits(lay.postings)) <= 2
    assert len(lay.list_commits(lay.term_stats)) <= 2
    from pysearch.verify import verify_index

    assert verify_index(spark, ix, check_crcs=False) == []
    s = Searcher(spark, ix)
    hits = s.search_ids("in the realm of", k=80, case_id="6")
    ix2 = str(tmp_path / "oneshot_ix")
    from pysearch.build import build_index

    build_index(spark, df, ix2, segment_size=16)
    fresh = Searcher(spark, ix2).search_ids("in the realm of", k=80,
                                            case_id="6")
    assert sorted(hits["score"]) == sorted(fresh["score"])


def test_streaming_dedup(spark, tmp_path):
    """Stateful cross-batch dedup: duplicate content arriving in a later
    file is suppressed by the state store."""
    import pandas as pd

    from pysearch import corpus
    from pysearch.streaming import streaming_dedup

    src = str(tmp_path / "src")
    rows1 = [corpus.row(1, i, "a cornucopia of", 8, 100) for i in range(1, 5)]
    rows2 = [corpus.row(1, i, "a cornucopia of", 8, 100) for i in range(5, 9)]
    dup = dict(rows1[0])
    dup["url"] = "doc://1/8888"  # duplicate content in the second batch
    rows2.append(dup)
    df1 = spark.createDataFrame(pd.DataFrame(rows1))
    df1.write.mode("overwrite").parquet(src)
    schema = df1.schema

    stream = spark.readStream.schema(schema).option(
        "maxFilesPerTrigger", 1
    ).parquet(src)
    deduped = streaming_dedup(stream)
    q = (
        deduped.select("url", "content_hash")
        .writeStream.format("memory").queryName("dd_out")
        .outputMode("append").start()
    )
    try:
        q.processAllAvailable()
        spark.createDataFrame(pd.DataFrame(rows2)).write.mode("append").parquet(src)
        q.processAllAvailable()
    finally:
        q.stop()
    got = spark.sql("SELECT url, content_hash FROM dd_out").collect()
    urls = sorted(r.url for r in got)
    # 8 unique contents; the duplicate url 8888 must be suppressed
    assert len(got) == 8, urls
    assert "doc://1/8888" not in urls
    assert len({r.content_hash for r in got}) == 8


def test_multimodal_features(spark):
    from pysearch.multimodal import FEATURE_DIM, extract_features, frame_sample

    import pandas as pd

    pdf = pd.DataFrame({
        "media_id": [1, 2, 3],
        "kind": ["image", "audio", "video"],
        "payload": [b"\x00\x01" * 600, b"xyz" * 400, bytes(range(256)) * 20],
        "meta": [{"src": "a"}, {"src": "b"}, {"src": "c"}],
    })
    df = spark.createDataFrame(
        pdf, schema="media_id long, kind string, payload binary, meta map<string,string>"
    )
    feats = extract_features(df, fake=True).collect()
    assert len(feats) == 3
    for r in feats:
        assert len(r.features) == FEATURE_DIM
        assert 64 <= r.width < 256 and 1 <= r.channels <= 4
        assert abs(sum(r.features) - 1.0) < 1e-5
    # determinism
    feats2 = extract_features(df, fake=True).collect()
    assert sorted(map(str, feats)) == sorted(map(str, feats2))

    frames = frame_sample(df, every_n_bytes=512, max_frames=4).collect()
    assert {r.media_id for r in frames} == {1, 2, 3}
    assert all(len(r.frame) <= 512 for r in frames)


def test_multimodal_real_decode_gated():
    from pysearch.multimodal import decode_media

    with pytest.raises(NotImplementedError):  # not a PNG, no PIL fallback
        decode_media(b"abc", "image", fake=False)
    with pytest.raises(NotImplementedError):  # not RIFF/WAVE
        decode_media(b"abc", "audio", fake=False)
    with pytest.raises(NotImplementedError):  # not ISO-BMFF
        decode_media(b"abc", "video", fake=False)
    with pytest.raises(NotImplementedError):  # BMFF signature, no moov
        decode_media(b"\x00\x00\x00\x10ftypisom\x00\x00\x02\x00", "video",
                     fake=False)


def _png(w: int, h: int, color_type: int = 6) -> bytes:
    """A fully valid PNG (correct chunk CRCs, zlib IDAT) built from stdlib,
    so PIL — when present — decodes it to the same (w, h, channels)."""
    import struct
    import zlib

    def chunk(tag, data):
        return (struct.pack(">I", len(data)) + tag + data
                + struct.pack(">I", zlib.crc32(tag + data)))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    nch = {0: 1, 2: 3, 6: 4}[color_type]
    raw = b"".join(b"\x00" + bytes(w * nch) for _ in range(h))
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b""))


def _wav(frames: int, rate: int, channels: int) -> bytes:
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(b"\x00\x00" * channels * frames)
    return buf.getvalue()


def _box(tag: bytes, body: bytes) -> bytes:
    import struct

    return struct.pack(">I", len(body) + 8) + tag + body


def _mp4(w: int, h: int, audio_tracks: int = 0) -> bytes:
    """A minimal valid ISO-BMFF container: ftyp + moov(mvhd, trak(tkhd)
    per track).  tkhd per spec §8.3.2 v0: fullbox(4) ids/times(16)
    reserved(4) duration(4) reserved(8) layer/alt/vol/reserved(8)
    matrix(36) then width/height as 16.16 fixed point."""
    import struct

    def tkhd(track_id, tw, th):
        body = (b"\x00\x00\x00\x07"            # version 0, flags=enabled
                + struct.pack(">III", 0, 0, track_id)
                + b"\x00" * 4 + struct.pack(">I", 1000) + b"\x00" * 8
                + b"\x00" * 8                  # layer/alternate/volume/resv
                + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0,
                              0x40000000)      # identity matrix
                + struct.pack(">II", tw << 16, th << 16))
        return _box(b"tkhd", body)

    mvhd = _box(b"mvhd", b"\x00" * 4 + struct.pack(">IIII", 0, 0, 600, 1000)
                + b"\x00" * 80)
    traks = [_box(b"trak", tkhd(1, w, h))]
    for i in range(audio_tracks):
        traks.append(_box(b"trak", tkhd(2 + i, 0, 0)))
    moov = _box(b"moov", mvhd + b"".join(traks))
    return _box(b"ftyp", b"isom\x00\x00\x02\x00isomiso2") + moov


def test_multimodal_real_decode_mp4():
    """Real video container metadata decode — no ffmpeg, no optional libs:
    the stdlib ISO-BMFF box walker reads track dimensions (16.16 fixed
    point tkhd) and the track count from a structurally valid MP4."""
    from pysearch.multimodal import decode_media

    assert decode_media(_mp4(640, 360), "video") == (640, 360, 1)
    assert decode_media(_mp4(1920, 1080, audio_tracks=1),
                        "video") == (1920, 1080, 2)
    # 64-bit largesize boxes walk too: rewrap moov with size==1 + largesize
    import struct

    p = _mp4(320, 240)
    ftyp_len = struct.unpack(">I", p[:4])[0]
    moov = p[ftyp_len:]
    big = (struct.pack(">I", 1) + b"moov"
           + struct.pack(">Q", len(moov) + 8) + moov[8:])
    assert decode_media(p[:ftyp_len] + big, "video") == (320, 240, 1)

    # unoptimized/progressive layouts lead with wide/free/mdat and put
    # moov LAST (ISO 14496-12 imposes no box order) — the signature gate
    # must accept them
    q = _mp4(640, 360)
    q_ftyp_len = struct.unpack(">I", q[:4])[0]
    tail = q[q_ftyp_len:]  # the moov box
    for lead in (b"wide", b"free", b"skip"):
        assert decode_media(_box(lead, b"") + tail,
                            "video") == (640, 360, 1)
    assert decode_media(_box(b"mdat", b"\x00" * 32) + tail,
                        "video") == (640, 360, 1)


def test_multimodal_real_decode_png_wav(spark):
    """Real (non-fake) decode works on real payloads without any optional
    library: PNG via the stdlib IHDR path (PIL path when installed), WAV
    via stdlib wave — end to end through the extract_features dataflow."""
    from pysearch.multimodal import FEATURE_DIM, decode_media, extract_features

    import pandas as pd

    assert decode_media(_png(33, 21, 6), "image") == (33, 21, 4)
    assert decode_media(_png(5, 7, 0), "image") == (5, 7, 1)
    assert decode_media(_png(8, 2, 2), "image") == (8, 2, 3)
    assert decode_media(_wav(100, 8000, 2), "audio") == (100, 8000, 2)

    pdf = pd.DataFrame({
        "media_id": [1, 2, 3, 4],
        "kind": ["image", "image", "audio", "video"],
        "payload": [_png(33, 21), _png(5, 7, 0), _wav(100, 8000, 2),
                    _mp4(640, 360, audio_tracks=1)],
        "meta": [{}, {}, {}, {}],
    })
    df = spark.createDataFrame(
        pdf,
        schema="media_id long, kind string, payload binary, "
               "meta map<string,string>",
    )
    rows = {r.media_id: r for r in
            extract_features(df, fake=False).collect()}
    assert (rows[1].width, rows[1].height, rows[1].channels) == (33, 21, 4)
    assert (rows[2].width, rows[2].height, rows[2].channels) == (5, 7, 1)
    assert (rows[3].width, rows[3].height, rows[3].channels) == (100, 8000, 2)
    assert (rows[4].width, rows[4].height, rows[4].channels) == (640, 360, 2)
    assert all(len(r.features) == FEATURE_DIM for r in rows.values())


def test_multimodal_pil_path_matches_stdlib():
    """When PIL is installed, the PIL branch must agree with the stdlib
    IHDR parse on the same payload (auto-skips in PIL-free sandboxes)."""
    pytest.importorskip("PIL")
    from pysearch.multimodal import _decode_image, decode_media

    p = _png(12, 9, 6)
    assert decode_media(p, "image") == (12, 9, 4) == _decode_image(p)
