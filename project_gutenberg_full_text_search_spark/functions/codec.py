"""Delta + varint posting-list codecs, vectorized in numpy.

The Spark-side analog of the storage behind PostgreSQL GIN posting trees
(reference: tables/mv_books_dc.sql:461-467 creates the GIN tsvector
indexes whose posting lists Postgres compresses internally). We store
posting blocks as parquet binary columns:

    doc_ids  → sorted uint64, delta-encoded then LEB128 varint
    tfs/dls  → uint64 varint (no delta; small values → mostly 1 byte)

Both directions are numpy-vectorized (no per-element Python loops): encode
fills bytes per significance-level in ≤10 passes; decode reconstructs via
np.add.reduceat over 7-bit payload segments.
"""

from __future__ import annotations

import numpy as np

_THRESHOLDS = (np.uint64(1) << (np.uint64(7) * np.arange(1, 10, dtype=np.uint64))).astype(
    np.uint64
)


def varint_encode_with_lengths(arr: np.ndarray) -> tuple[bytes, np.ndarray]:
    """LEB128-encode a uint64 array; also return per-value byte lengths
    (enables one encode pass per *batch* with per-group byte slicing —
    the per-posting-list encode-call overhead dominates otherwise)."""
    arr = np.ascontiguousarray(arr, dtype=np.uint64)
    if arr.size == 0:
        return b"", np.empty(0, dtype=np.int64)
    # bytes needed per value: 1 + #thresholds the value reaches
    nbytes = np.ones(arr.size, dtype=np.int64)
    for t in _THRESHOLDS:
        nbytes += (arr >= t).astype(np.int64)
    total = int(nbytes.sum())
    out = np.zeros(total, dtype=np.uint8)
    starts = np.concatenate(([0], np.cumsum(nbytes)[:-1]))
    for j in range(10):
        mask = nbytes > j
        if not mask.any():
            break
        vals = (arr[mask] >> np.uint64(7 * j)) & np.uint64(0x7F)
        cont = (nbytes[mask] > j + 1).astype(np.uint8) << 7
        out[starts[mask] + j] = vals.astype(np.uint8) | cont
    return out.tobytes(), nbytes


def varint_encode(arr: np.ndarray) -> bytes:
    """LEB128-encode a uint64 array."""
    return varint_encode_with_lengths(arr)[0]


def group_byte_ranges(nbytes: np.ndarray, group_starts: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Byte [start, end) of each contiguous value-group in an encoded buffer."""
    ends_b = np.cumsum(nbytes)
    starts_b = np.concatenate(([0], ends_b[:-1]))
    g_start = starts_b[group_starts]
    total = int(ends_b[-1]) if len(ends_b) else 0
    g_end = np.concatenate((g_start[1:], [total]))
    return g_start, g_end


def delta_encode_grouped(
    vals: np.ndarray, group_starts: np.ndarray
) -> tuple[bytes, np.ndarray, np.ndarray]:
    """Delta+varint encode many concatenated sorted groups in ONE pass.

    Per-group bytes are identical to ``delta_encode(group)``; returns
    (buffer, per-group byte starts, per-group byte ends).
    """
    v = np.ascontiguousarray(vals, dtype=np.uint64)
    if v.size == 0:
        return b"", np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
    prev = np.empty_like(v)
    prev[0] = 0
    prev[1:] = v[:-1]
    deltas = v - prev
    deltas[group_starts] = v[group_starts]  # group-initial values stay absolute
    buf, nbytes = varint_encode_with_lengths(deltas)
    gs, ge = group_byte_ranges(nbytes, group_starts)
    return buf, gs, ge


def varint_decode(buf: bytes) -> np.ndarray:
    """Decode LEB128 bytes → uint64 array."""
    b = np.frombuffer(buf, dtype=np.uint8)
    if b.size == 0:
        return np.empty(0, dtype=np.uint64)
    ends = np.nonzero(b < 128)[0]
    starts = np.concatenate(([0], ends[:-1] + 1))
    lengths = ends - starts + 1
    within = np.arange(b.size, dtype=np.int64) - np.repeat(starts, lengths)
    payload = (b & np.uint8(0x7F)).astype(np.uint64) << (
        np.uint64(7) * within.astype(np.uint64)
    )
    return np.add.reduceat(payload, starts)


def delta_encode(sorted_ids: np.ndarray) -> bytes:
    """Delta+varint encode a strictly-increasing uint64 array."""
    a = np.ascontiguousarray(sorted_ids, dtype=np.uint64)
    if a.size == 0:
        return b""
    deltas = np.empty_like(a)
    deltas[0] = a[0]
    np.subtract(a[1:], a[:-1], out=deltas[1:])
    return varint_encode(deltas)


def delta_decode(buf: bytes) -> np.ndarray:
    d = varint_decode(buf)
    return np.cumsum(d, dtype=np.uint64)


def delta_decode_segments(
    buf: bytes, seg_byte_lens: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """Decode a CONCATENATION of per-group delta+varint streams in one
    vectorized pass → (flat values, per-group value counts).

    Per-group values are identical to ``delta_decode`` of that group's
    byte slice; the flat layout is what the phrase-adjacency kernel
    consumes directly. Replaces the per-group ``delta_decode`` loop whose
    ~20 µs/call numpy fixed cost dominated position decoding (measured
    1.6 s for 77k tiny per-doc lists — OPTIMIZATION_r06.md): one pass
    over the whole buffer costs the same as one medium-sized decode.

    The segmented delta reconstruction: a global cumsum over the flat
    deltas, then per group subtract the cumsum value just before its
    first element — uint64 wrap-around-exact because each group's true
    values are the group-local cumsum and subtraction mod 2^64 inverts
    the addition mod 2^64.
    """
    seg_byte_lens = np.asarray(seg_byte_lens, dtype=np.int64)
    b = np.frombuffer(buf, dtype=np.uint8)
    if b.size == 0:
        return (
            np.empty(0, dtype=np.uint64),
            np.zeros(len(seg_byte_lens), dtype=np.int64),
        )
    ends = np.nonzero(b < 128)[0]  # index of each value's final byte
    starts = np.concatenate(([0], ends[:-1] + 1))
    lengths = ends - starts + 1
    within = np.arange(b.size, dtype=np.int64) - np.repeat(starts, lengths)
    payload = (b & np.uint8(0x7F)).astype(np.uint64) << (
        np.uint64(7) * within.astype(np.uint64)
    )
    d = np.add.reduceat(payload, starts)
    seg_ends_b = np.cumsum(seg_byte_lens)
    cum_counts = np.searchsorted(ends, seg_ends_b - 1, side="right")
    counts = np.diff(np.concatenate(([0], cum_counts)))
    c = np.cumsum(d, dtype=np.uint64)
    seg_starts_v = cum_counts - counts
    base = np.zeros(len(counts), dtype=np.uint64)
    nz = seg_starts_v > 0
    base[nz] = c[seg_starts_v[nz] - 1]
    vals = c - np.repeat(base, counts)
    return vals, counts
