"""Delta + varbyte posting-block codec (numpy-vectorized).

The reference stores posting lists as Postgres hstore maps of strings
(terms.tf_scores — migrations/06_create_terms_table.sql, ~10 bytes per
posting of pure overhead). Our block layout is the standard IR design
(see e.g. the block-max WAND literature): per term, doc_ids sorted
ascending, chunked into BLOCK_SIZE-doc blocks, gaps varbyte-encoded;
tf values varbyte-encoded alongside. Per-block (min_doc, max_doc,
max_tf, max_score) metadata powers query-time block skipping.

Encode/decode are pure numpy (no per-element Python loops): varbyte
encode computes per-value byte-lengths, scatters 7-bit groups into a
preallocated byte array; decode segments the byte stream on
continuation bits with cumsum tricks. Used inside applyInPandas — the
Arrow batch boundary is the only Python crossing.
"""

from __future__ import annotations

import numpy as np

BLOCK_SIZE = 128


def varbyte_encode(values: np.ndarray) -> bytes:
    """uint64 array → varbyte (LSB-first 7-bit groups, MSB=continuation)."""
    v = np.asarray(values, dtype=np.uint64)
    if v.size == 0:
        return b""
    # bytes needed per value = ceil(bitlen/7), min 1; bit length computed
    # with shift/mask passes (float log2 is unsafe past 2^53)
    blen = np.ones(v.shape, dtype=np.int64)
    x = v.copy()
    for shift in (32, 16, 8, 4, 2, 1):
        mask = x >= (np.uint64(1) << np.uint64(shift))
        blen[mask] += shift
        x[mask] >>= np.uint64(shift)
    nbytes = (blen + 6) // 7
    total = int(nbytes.sum())
    out = np.zeros(total, dtype=np.uint8)
    ends = np.cumsum(nbytes)
    starts = ends - nbytes
    work = v.copy()
    maxb = int(nbytes.max())
    for k in range(maxb):
        sel = nbytes > k
        pos = starts[sel] + k
        byte = (work[sel] & np.uint64(0x7F)).astype(np.uint8)
        cont = (k + 1 < nbytes[sel]).astype(np.uint8) << 7
        out[pos] = byte | cont
        work[sel] >>= np.uint64(7)
    return out.tobytes()


def varbyte_decode(data: bytes) -> np.ndarray:
    """varbyte → uint64 array (vectorized segment reduction)."""
    if not data:
        return np.zeros(0, dtype=np.uint64)
    b = np.frombuffer(data, dtype=np.uint8)
    is_last = (b & 0x80) == 0
    # value index for each byte: cumsum of is_last shifted right
    value_idx = np.zeros(b.shape, dtype=np.int64)
    value_idx[1:] = np.cumsum(is_last)[:-1]
    n_values = int(is_last.sum())
    # byte position within its value
    starts = np.zeros(n_values, dtype=np.int64)
    ends_mask = np.flatnonzero(is_last)
    starts[1:] = ends_mask[:-1] + 1
    byte_pos = np.arange(b.size, dtype=np.int64) - starts[value_idx]
    contrib = (b & 0x7F).astype(np.uint64) << (np.uint64(7) * byte_pos.astype(np.uint64))
    out = np.zeros(n_values, dtype=np.uint64)
    np.add.at(out, value_idx, contrib)
    return out


def encode_block(doc_ids: np.ndarray, tfs: np.ndarray) -> tuple[bytes, bytes]:
    """sorted doc_ids (int64, may be negative — zigzag applied) + tfs →
    (doc_bytes, tf_bytes). First doc stored absolute (zigzag), rest as
    gaps (always ≥1, stored as gap)."""
    d = np.asarray(doc_ids, dtype=np.int64)
    deltas = np.empty(d.shape, dtype=np.uint64)
    # zigzag the first absolute id (xxhash64 ids are signed)
    first = np.uint64((d[0] << 1) ^ (d[0] >> 63)) if d.size else np.uint64(0)
    if d.size:
        deltas[0] = first
        deltas[1:] = (d[1:] - d[:-1]).astype(np.uint64)
    return varbyte_encode(deltas), varbyte_encode(np.asarray(tfs, dtype=np.uint64))


def decode_block(doc_bytes: bytes, tf_bytes: bytes) -> tuple[np.ndarray, np.ndarray]:
    deltas = varbyte_decode(doc_bytes)
    if deltas.size == 0:
        return np.zeros(0, dtype=np.int64), np.zeros(0, dtype=np.int64)
    z = deltas[0]
    first = np.int64(z >> np.uint64(1)) ^ -np.int64(z & np.uint64(1))
    docs = np.empty(deltas.shape, dtype=np.int64)
    docs[0] = first
    if deltas.size > 1:
        docs[1:] = deltas[1:].astype(np.int64)
        np.cumsum(docs, out=docs)
    tfs = varbyte_decode(tf_bytes).astype(np.int64)
    return docs, tfs
