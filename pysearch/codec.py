"""Posting-block codec: delta-gap + varint (LEB128) packing, numpy-vectorized.

The reference delegates posting-list compression to bleve's scorch engine
(RoaringBitmap posting lists, /root/reference/go.mod:4) and uses flate for
its sidecar store (/root/reference/internal/utils/data.go:38-90).  Our
engine's mandated layout (BASELINE.json north_rule) is delta-gap + varint
block compression with per-block max-score metadata; this module is that
codec.  Blocks hold three parallel integer arrays per run of postings:

    doc_ids (sorted, delta-gapped), tfs, doc_lens

Encoding/decoding is fully vectorized (no per-element Python loops: the
LEB128 byte expansion loops over the ≤10 *byte positions*, not over values),
so it runs at memory bandwidth inside Arrow UDFs.
"""

from __future__ import annotations

import numpy as np

BLOCK_SIZE = 128  # postings per block


def varint_encode_with_offsets(values: np.ndarray):
    """LEB128-encode a uint64 array; also return the byte offset of each
    value (length n+1) so callers can slice the buffer into sub-runs without
    re-encoding (pack_run encodes each term run once and slices blocks)."""
    v = np.asarray(values, dtype=np.uint64)
    if v.size == 0:
        return b"", np.zeros(1, dtype=np.int64)
    nbytes = np.ones(v.shape, dtype=np.int64)
    tmp = v >> np.uint64(7)
    while tmp.any():
        nbytes += (tmp > 0).astype(np.int64)
        tmp >>= np.uint64(7)
    offsets = np.zeros(v.size + 1, dtype=np.int64)
    np.cumsum(nbytes, out=offsets[1:])
    out = np.empty(int(offsets[-1]), dtype=np.uint8)
    starts = offsets[:-1]
    shifted = v.copy()
    remaining = nbytes.copy()
    pos = 0
    while (remaining > 0).any():
        active = remaining > 0
        idx = starts[active] + pos
        byte = (shifted[active] & np.uint64(0x7F)).astype(np.uint8)
        cont = (remaining[active] > 1).astype(np.uint8) << 7
        out[idx] = byte | cont
        shifted[active] >>= np.uint64(7)
        remaining[active] -= 1
        pos += 1
    return out.tobytes(), offsets


def varint_encode(values: np.ndarray) -> bytes:
    """LEB128-encode a uint64 array."""
    return varint_encode_with_offsets(values)[0]


def varint_decode(buf: bytes, count: int) -> np.ndarray:
    """Decode `count` LEB128 values from buf -> uint64 array. Vectorized."""
    if count == 0:
        return np.empty(0, dtype=np.uint64)
    raw = np.frombuffer(buf, dtype=np.uint8)
    is_last = (raw & 0x80) == 0
    # index of the first byte of each value = 0 and positions after each last
    ends = np.flatnonzero(is_last)
    if ends.size < count:
        raise ValueError(f"varint buffer truncated: {ends.size} < {count}")
    ends = ends[:count]
    starts = np.concatenate(([0], ends[:-1] + 1))
    out = np.zeros(count, dtype=np.uint64)
    nbytes = ends - starts + 1
    maxb = int(nbytes.max())
    for b in range(maxb):
        active = nbytes > b
        idx = starts[active] + b
        out[active] |= (raw[idx] & np.uint64(0x7F)).astype(np.uint64) << np.uint64(7 * b)
    return out


def delta_encode(sorted_ids: np.ndarray) -> np.ndarray:
    """Sorted int64 ids -> gaps (first value kept absolute)."""
    a = np.asarray(sorted_ids, dtype=np.int64)
    out = np.empty_like(a)
    if a.size:
        out[0] = a[0]
        np.subtract(a[1:], a[:-1], out=out[1:])
    return out


def delta_decode(gaps: np.ndarray) -> np.ndarray:
    return np.cumsum(np.asarray(gaps, dtype=np.int64))


def pack_run(doc_ids: np.ndarray, tfs: np.ndarray, dls: np.ndarray):
    """Split one term's sorted posting run into packed blocks.

    Yields (block_id, n, doc_ids_bin, tfs_bin, dls_bin, min_doc_id,
    max_doc_id, max_tf, min_dl) tuples.  max_tf/min_dl give a lossless
    BM25 upper bound for the block:
        ub = idf * (k1+1) * max_tf / (max_tf + K(min_dl))
    since tf-normalization is increasing in tf and decreasing in dl.

    The whole run is varint-encoded once (three buffers) and blocks are
    byte slices: each block's first doc id is stored absolute (the gap at
    block starts is replaced pre-encoding) so blocks stay independently
    decodable.
    """
    n = doc_ids.size
    gaps = delta_encode(doc_ids)
    gaps[::BLOCK_SIZE] = doc_ids[::BLOCK_SIZE]  # block-local absolute base
    id_buf, id_off = varint_encode_with_offsets(gaps.astype(np.uint64))
    tf_buf, tf_off = varint_encode_with_offsets(np.asarray(tfs, dtype=np.uint64))
    dl_buf, dl_off = varint_encode_with_offsets(np.asarray(dls, dtype=np.uint64))
    for b, start in enumerate(range(0, n, BLOCK_SIZE)):
        end = min(start + BLOCK_SIZE, n)
        t = tfs[start:end]
        d = dls[start:end]
        yield (
            b,
            int(end - start),
            id_buf[id_off[start]:id_off[end]],
            tf_buf[tf_off[start]:tf_off[end]],
            dl_buf[dl_off[start]:dl_off[end]],
            int(doc_ids[start]),
            int(doc_ids[end - 1]),
            int(t.max()),
            int(d.min()),
        )


def unpack_block(n: int, doc_ids_bin: bytes, tfs_bin: bytes, dls_bin: bytes):
    """Inverse of pack_run for one block -> (doc_ids, tfs, dls) int64/float."""
    ids = delta_decode(varint_decode(doc_ids_bin, n).astype(np.int64))
    tfs = varint_decode(tfs_bin, n).astype(np.int64)
    dls = varint_decode(dls_bin, n).astype(np.int64)
    return ids, tfs, dls


def unpack_blocks_batch(ns, doc_ids_bins, tfs_bins, dls_bins):
    """Decode MANY blocks in one vectorized pass -> (ids, tfs, dls) big
    arrays (block payloads concatenated in input order).

    LEB128 streams concatenate losslessly (continuation bits delimit
    values), so the three buffers are joined and decoded once — per-block
    decode pays fixed numpy call overhead on ~128-value arrays, which
    dominates the query-side hot loop.  Delta decoding is segmented: every
    block's first stored id is absolute (pack's block-local base), so
    ids = running-cumsum with a per-block rebase.
    """
    ns = np.asarray(ns, dtype=np.int64)
    total = int(ns.sum())
    if total == 0:
        z = np.empty(0, dtype=np.int64)
        return z, z.copy(), z.copy()
    gaps = varint_decode(b"".join(doc_ids_bins), total).astype(np.int64)
    tfs = varint_decode(b"".join(tfs_bins), total).astype(np.int64)
    dls = varint_decode(b"".join(dls_bins), total).astype(np.int64)
    starts = np.zeros(ns.size, dtype=np.int64)
    np.cumsum(ns[:-1], out=starts[1:])
    cs = np.cumsum(gaps)
    base = cs[starts] - gaps[starts]  # cumsum carried in from prior blocks
    ids = cs - np.repeat(base, ns)
    return ids, tfs, dls


def unpack_positions_batch(counts, pos_bins):
    """Decode packed term positions for many postings in one pass.

    ``counts``: int64 array — positions per posting (== each posting's tf),
    concatenated across blocks in input order; ``pos_bins``: the blocks'
    ``pos_bin`` payloads in the same order.  Positions are delta-gapped with
    an absolute base per POSTING (each doc's position list restarts), so the
    decode is the same segmented-cumsum rebase as doc ids — resets at
    posting boundaries instead of block boundaries.  Returns one flat int64
    array; slice it with ``np.cumsum(counts)``.
    """
    counts = np.asarray(counts, dtype=np.int64)
    total = int(counts.sum())
    if total == 0:
        return np.empty(0, dtype=np.int64)
    gaps = varint_decode(b"".join(pos_bins), total).astype(np.int64)
    keep = counts > 0  # tf is >= 1 in practice, but stay total
    starts = np.zeros(int(keep.sum()), dtype=np.int64)
    np.cumsum(counts[keep][:-1], out=starts[1:])
    cs = np.cumsum(gaps)
    base = cs[starts] - gaps[starts]
    return cs - np.repeat(base, counts[keep])
