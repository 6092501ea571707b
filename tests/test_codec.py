"""Posting-block codec properties (mirrors the reference's round-trip test
strategy, /root/reference/internal/utils/data_test.go:12-46)."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from pysearch import codec


@given(st.lists(st.integers(min_value=0, max_value=2**63 - 1), max_size=300))
@settings(max_examples=200, deadline=None)
def test_varint_roundtrip(values):
    arr = np.array(values, dtype=np.uint64)
    buf = codec.varint_encode(arr)
    out = codec.varint_decode(buf, len(values))
    assert (out == arr).all()


def test_varint_sizes():
    assert codec.varint_encode(np.array([0], dtype=np.uint64)) == b"\x00"
    assert codec.varint_encode(np.array([127], dtype=np.uint64)) == b"\x7f"
    assert codec.varint_encode(np.array([128], dtype=np.uint64)) == b"\x80\x01"
    assert codec.varint_encode(np.array([300], dtype=np.uint64)) == b"\xac\x02"


@given(st.lists(st.integers(min_value=0, max_value=2**40), min_size=1, max_size=500, unique=True))
@settings(max_examples=100, deadline=None)
def test_delta_roundtrip(ids):
    arr = np.sort(np.array(ids, dtype=np.int64))
    gaps = codec.delta_encode(arr)
    assert (codec.delta_decode(gaps) == arr).all()
    assert (gaps[1:] > 0).all()


def test_pack_unpack_blocks():
    rng = np.random.RandomState(7)
    n = 1000
    ids = np.sort(rng.choice(10_000_000, size=n, replace=False)).astype(np.int64)
    tfs = rng.randint(1, 50, size=n).astype(np.int64)
    dls = rng.randint(10, 5000, size=n).astype(np.int64)
    blocks = list(codec.pack_run(ids, tfs, dls))
    assert len(blocks) == int(np.ceil(n / codec.BLOCK_SIZE))
    got_ids, got_tfs, got_dls = [], [], []
    for (b, cnt, ib, tb, db, mn, mx, mtf, mdl) in blocks:
        i2, t2, d2 = codec.unpack_block(cnt, ib, tb, db)
        assert i2[0] == mn and i2[-1] == mx
        assert t2.max() == mtf and d2.min() == mdl
        got_ids.append(i2)
        got_tfs.append(t2)
        got_dls.append(d2)
    assert (np.concatenate(got_ids) == ids).all()
    assert (np.concatenate(got_tfs) == tfs).all()
    assert (np.concatenate(got_dls) == dls).all()


def test_compression_is_compact():
    # dense doc ids (gap 1-3) should pack to ~1 byte each
    ids = np.cumsum(np.random.RandomState(0).randint(1, 4, size=1000)).astype(np.int64)
    buf = codec.varint_encode(codec.delta_encode(ids).astype(np.uint64))
    assert len(buf) <= 1100


def test_unpack_blocks_batch_matches_per_block():
    """Batched decode == per-block decode for many mixed-size runs."""
    import numpy as np

    from pysearch import codec

    rng = np.random.RandomState(7)
    blocks = []
    for run in range(20):
        n = int(rng.randint(1, 400))
        ids = np.sort(rng.choice(10**6, size=n, replace=False)).astype(np.int64)
        tfs = rng.randint(1, 50, size=n).astype(np.int64)
        dls = rng.randint(10, 5000, size=n).astype(np.int64)
        for (b, cnt, ib, tfb, dlb, *_rest) in codec.pack_run(ids, tfs, dls):
            blocks.append((cnt, ib, tfb, dlb))
    want_i, want_t, want_d = [], [], []
    for cnt, ib, tfb, dlb in blocks:
        i, t, d = codec.unpack_block(cnt, ib, tfb, dlb)
        want_i.append(i); want_t.append(t); want_d.append(d)
    gi, gt, gd = codec.unpack_blocks_batch(
        [b[0] for b in blocks], [b[1] for b in blocks],
        [b[2] for b in blocks], [b[3] for b in blocks])
    assert (np.concatenate(want_i) == gi).all()
    assert (np.concatenate(want_t) == gt).all()
    assert (np.concatenate(want_d) == gd).all()
    # empty input
    e = codec.unpack_blocks_batch([], [], [], [])
    assert all(x.size == 0 for x in e)
