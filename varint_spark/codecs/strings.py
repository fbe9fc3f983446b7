"""String-column codecs: PLAIN_STR, DICT_STR, FSST_STR.

The reference has no string codecs (integers only — SURVEY §1.3); these
generalize its dictionary design (sorted uniques + packed indices,
reference src/varintDict.c:95-224) to strings and add an FSST-style
symbol table for high-cardinality text.

String arrays cross these kernels as Arrow large_utf8 — the offsets/data
buffers are used directly, so conversion is zero-copy-ish and never
per-row Python.

Layouts (inside the standard block container)::

    PLAIN_STR: [lengths: leb128 stream][utf-8 data]
    DICT_STR : [codes: nested int block][dict: nested PLAIN_STR block]
    FSST_STR : [lengths: leb128 stream][fsst table + compressed corpus]

DICT_STR's codes are a *nested self-describing int block* chosen by the
adaptive int selector — run-heavy columns (``role``) get RLE-on-codes for
free, mirroring how the reference composes codecs in its adaptive path.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from . import blocks, fsst, leb128


def to_plane(values) -> tuple[np.ndarray, np.ndarray]:
    """string array-like (no nulls) -> (lengths int64, utf8 corpus uint8)."""
    arr = values if isinstance(values, pa.Array) else pa.array(values, type=pa.large_utf8())
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if arr.null_count:
        raise ValueError("nulls must be stripped by the NULLABLE wrapper")
    arr = arr.cast(pa.large_utf8())
    buffers = arr.buffers()
    offsets = np.frombuffer(buffers[1], dtype=np.int64, count=len(arr) + 1, offset=arr.offset * 8)
    data = np.frombuffer(buffers[2], dtype=np.uint8) if buffers[2] is not None else np.empty(0, np.uint8)
    lengths = np.diff(offsets)
    corpus = data[offsets[0] : offsets[-1]]
    return lengths.astype(np.int64), corpus


def from_plane(lengths: np.ndarray, corpus: np.ndarray) -> pa.Array:
    """(lengths, utf8 corpus) -> Arrow large_utf8 array."""
    offsets = np.zeros(len(lengths) + 1, dtype=np.int64)
    np.cumsum(lengths, out=offsets[1:])
    return pa.Array.from_buffers(
        pa.large_utf8(), len(lengths),
        [None, pa.py_buffer(offsets.tobytes()), pa.py_buffer(np.ascontiguousarray(corpus).tobytes())],
    )


# ---- PLAIN_STR ----------------------------------------------------------------

def encode_plain(values) -> bytes:
    lengths, corpus = to_plane(values)
    return leb128.encode(lengths.astype(np.uint64)) + corpus.tobytes()


def decode_plain(buf: memoryview | bytes, count: int) -> pa.Array:
    if count == 0:
        return pa.array([], type=pa.large_utf8())
    b = np.frombuffer(buf, dtype=np.uint8)
    term = (b & 0x80) == 0
    len_end = int(np.flatnonzero(term)[count - 1]) + 1
    lengths = leb128.decode(b[:len_end], count).astype(np.int64)
    return from_plane(lengths, b[len_end:])


# ---- DICT_STR -------------------------------------------------------------------

# Sorted-dict format-version marker. The v0 (unsorted, first-occurrence
# order) layout started directly with put_sub(codes_block) — a LEB128
# length whose first byte can never be 0x01 (a sub-block is ≥ 2 bytes, and
# any multi-byte LEB128 length has its high bit set) — so v0 blocks are
# rejected LOUDLY instead of silently mis-answering the bisect-based
# predicates that assume code order == string order.
DICT_SORTED_V1 = 0x01


def check_dict_version(mv: memoryview) -> memoryview:
    """Verify the sorted-dict marker; return the payload past it."""
    if len(mv) == 0 or mv[0] != DICT_SORTED_V1:
        raise ValueError(
            "DICT_STR block lacks the sorted-dict v1 marker — encoded by a "
            "pre-sorted-dict engine; re-encode (bisect predicates would "
            "silently return wrong rows on first-occurrence code order)")
    return mv[1:]


def encode_dict(values, encode_int_block=None) -> bytes:
    """Dictionary-encode; ``encode_int_block(int64 array) -> block bytes``
    defaults to the adaptive selector (lazy import avoids a cycle).

    The dictionary is stored SORTED (the reference builds its dict via
    qsort + unique, src/varintDict.c:95-224): code order == string order,
    so equality is a binary search (varintDictFind) and prefix/range
    string predicates become ONE contiguous code range answered by the
    int encoded-form compare machinery (random_access.str_filter_prefix).
    Sorting is also what makes block bytes deterministic — Arrow's
    dictionary_encode() alone yields first-occurrence order, which
    depends on row order within the chunk."""
    if encode_int_block is None:
        from ..selector import encode_int_block  # noqa: PLC0415
    import pyarrow.compute as pc
    arr = values if isinstance(values, pa.Array) else pa.array(values, type=pa.large_utf8())
    denc = arr.dictionary_encode()
    codes = denc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    uniq = denc.dictionary
    order = pc.sort_indices(uniq).to_numpy().astype(np.int64)
    rank = np.empty(len(order), dtype=np.int64)
    rank[order] = np.arange(len(order), dtype=np.int64)
    codes = rank[codes]
    uniq = uniq.take(pa.array(order))
    return bytes([DICT_SORTED_V1]) + blocks.put_sub(encode_int_block(codes)) + blocks.put_sub(
        blocks.pack_block(blocks.PLAIN_STR, len(uniq), encode_plain(uniq))
    )


def decode_dict(buf: memoryview | bytes, count: int, decode_int_block=None) -> pa.Array:
    if decode_int_block is None:
        from ..selector import decode_int_block  # noqa: PLC0415
    if count == 0:
        return pa.array([], type=pa.large_utf8())
    mv = check_dict_version(memoryview(buf))
    codes_blk, pos = blocks.take_sub(mv, 0)
    dict_blk, _ = blocks.take_sub(mv, pos)
    codes = decode_int_block(codes_blk)
    _, n_uniq, payload = blocks.unpack_block(dict_blk)
    uniq = decode_plain(payload, n_uniq)
    return uniq.take(pa.array(codes.astype(np.int64)))


# ---- shared-table variants (broadcast dict / FSST — reference analog:
# ---- varintDictEncodeWithDict, src/varintDict.h:72-76) ---------------------------

def encode_dict_shared(values, digest: str, dict_arr: pa.Array,
                       encode_int_block) -> bytes | None:
    """Codes against a broadcast dictionary. None if any value misses
    (chunk drifted from the table — caller falls back to a local dict)."""
    import pyarrow.compute as pc

    arr = values if isinstance(values, pa.Array) else pa.array(values, type=pa.large_utf8())
    codes = pc.index_in(arr, value_set=dict_arr)
    if codes.null_count:
        return None
    codes_np = codes.to_numpy(zero_copy_only=False).astype(np.int64)
    return digest.encode("ascii") + blocks.put_sub(encode_int_block(codes_np))


def decode_dict_shared(buf: memoryview | bytes, count: int, digest: str,
                       dict_arr: pa.Array, decode_int_block) -> pa.Array:
    mv = memoryview(buf)
    got = bytes(mv[:16]).decode("ascii")
    if got != digest:
        raise ValueError(f"shared-dict digest mismatch: block={got} tables={digest}")
    codes_blk, _ = blocks.take_sub(mv, 16)
    codes = decode_int_block(codes_blk)
    return dict_arr.take(pa.array(codes, type=pa.int64()))


def encode_fsst_shared(values, digest: str, tables: bytes) -> bytes | None:
    """Corpus compressed with broadcast FSST tables (no training pass).
    None when a corpus byte collides with a symbol code — caller falls back."""
    lengths, corpus = to_plane(values)
    comp = fsst.apply_tables(corpus, tables)
    if comp is None:
        return None
    return digest.encode("ascii") + leb128.encode(lengths.astype(np.uint64)) + comp.tobytes()


def decode_fsst_shared(buf: memoryview | bytes, count: int, digest: str,
                       tables: bytes) -> pa.Array:
    mv = memoryview(buf)
    got = bytes(mv[:16]).decode("ascii")
    if got != digest:
        raise ValueError(f"shared-fsst digest mismatch: block={got} tables={digest}")
    if count == 0:
        return pa.array([], type=pa.large_utf8())
    b = np.frombuffer(mv[16:], dtype=np.uint8)
    term = (b & 0x80) == 0
    len_end = int(np.flatnonzero(term)[count - 1]) + 1
    lengths = leb128.decode(b[:len_end], count).astype(np.int64)
    corpus = fsst.decompress_with(b[len_end:], tables)
    return from_plane(lengths, corpus)


# ---- FSST_STR -------------------------------------------------------------------

def encode_fsst(values, reuse_tables: bytes | None = None):
    """-> (payload, tables) or None when incompressible.

    ``reuse_tables``: serialized tables from a sibling chunk (same column,
    same group) — skips the training pass; falls back to fresh training on
    symbol-code collision. Tables are embedded in the payload either way,
    so blocks stay self-describing."""
    lengths, corpus = to_plane(values)
    if reuse_tables is not None:
        comp = fsst.apply_tables(corpus, reuse_tables)
        if comp is not None:
            return (leb128.encode(lengths.astype(np.uint64)) + reuse_tables
                    + comp.tobytes(), reuse_tables)
    parts = fsst.compress_parts(corpus)
    if parts is None:
        return None
    tables, comp = parts
    return leb128.encode(lengths.astype(np.uint64)) + tables + comp, tables


def decode_fsst(buf: memoryview | bytes, count: int) -> pa.Array:
    if count == 0:
        return pa.array([], type=pa.large_utf8())
    b = np.frombuffer(buf, dtype=np.uint8)
    term = (b & 0x80) == 0
    len_end = int(np.flatnonzero(term)[count - 1]) + 1
    lengths = leb128.decode(b[:len_end], count).astype(np.int64)
    corpus = fsst.decompress(b[len_end:])
    return from_plane(lengths, corpus)
