"""Fixed-dimension float32 matrix codec — the embedding-column path.

The reference's dimension-matrix codec stores (rows × cols) packed entries
behind a tiny shape header (reference src/varintDimension.h:30-56 pair
header, src/varintDimension.c:183-310 dense packed storage); its float
codec supplies the per-value precision modes (src/varintFloat.h:27-114).
This codec composes the two for the column type an LLM training pipeline
stores most of its bytes in: ``array<float>`` embeddings.

Approach: an (n, dim) float32 matrix is flattened COLUMN-MAJOR (plane by
plane, like the reference's dimension-major packed layout) and cast to
float64 — an exact widening — then run through the existing f64lossy
sign/exponent/mantissa machinery:

* lossless: f64 precision "high" keeps 23 mantissa bits, which is every
  bit a float32 has — the round-trip is bit-identical (the widened
  pattern's low 29 bits are zero, so round-to-nearest is the identity).
* lossy (explicit opt-in): "medium"/"low" (10/4 mantissa bits) with the
  same 2^-mbits relative-error bound as the scalar float codec; the final
  f64→f32 cast adds at most one f32 ulp (2^-24 relative).

The column-major order matters: each dimension's exponents are
contiguous, so the f64lossy payload's nested adaptive exponent block sees
per-plane coherence (normalized embeddings concentrate each plane's
exponents in a narrow band → FOR packs them to a few bits — the
reference's COMMON_EXPONENT insight, src/varintFloat.h:107, applied
plane-wise for free).

A cost gate guards the lossless path: if the structured encoding beats
raw float32 bytes it is kept, else the payload falls back to plain f32
little-endian — encoded ≤ plain, always, like every other codec here.

Payload layout (after the standard [codec_id][count=n_rows] header)::

    [dim: leb128]
    [mode: 1]        0 = plain f32 LE (column-major), 1..4 = f64lossy
                     precision full/high/medium/low over the widened
                     planes, 5 = CSR sparse (the reference header's
                     reserved sparse marker, src/varintDimension.h:38-46,
                     given a real body)
    [body]

Per-entry access note: value (i, j) lives at flat index j*n + i; the
plain mode reads it directly, the f64lossy mode currently decodes the
block (the mantissa plane is fixed-stride, so an O(1) path like
random_access.py's FOR/BP128 slicing is possible — documented non-goal
until a query needs it).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from . import blocks, f64lossy

_MODE_PLAIN = 0
_MODE_OF_PRECISION = {"full": 1, "high": 2, "medium": 3, "low": 4}
_PRECISION_OF_MODE = {v: k for k, v in _MODE_OF_PRECISION.items()}
# CSR-style sparse plane — the reference's dimension-pair header reserves a
# sparse/dense marker bit (VARINT_DIMENSION_PAIR_IS_SPARSE,
# src/varintDimension.h:38-46) but never implements the sparse body; this
# mode completes it: [nnz: leb128][positions: nested adaptive int block
# over the sorted column-major flat indices][values: f32 LE at those
# positions]. "Zero" means the all-zeros BIT PATTERN only (+0.0) — -0.0,
# NaN payloads and denormals are stored as values, keeping the lossless
# contract bit-exact. Competes in the same cost gate as the dense body.
_MODE_SPARSE = 5

# f32-lossless f64 precision: 23 mantissa bits == all of float32's
LOSSLESS = "high"


def list_to_matrix(arr: pa.Array) -> np.ndarray:
    """Zero-copy (n, dim) float32 view of an Arrow list<float> array with
    no null rows; raises on ragged widths (embeddings are fixed-dim) and
    on null ELEMENTS inside a row — np.asarray would silently turn those
    into NaN, breaking the codec's bit-exact lossless contract (null ROWS
    are the nullable wrapper's job; null elements have no representation)."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    n = len(arr)
    if n == 0:
        return np.empty((0, 0), dtype=np.float32)
    offsets = np.asarray(arr.offsets)
    widths = np.diff(offsets)
    dim = int(widths[0])
    if not (widths == dim).all():
        raise ValueError("ragged embedding column (list widths differ)")
    child = arr.values.slice(int(offsets[0]), int(offsets[-1] - offsets[0]))
    if child.null_count:
        raise ValueError(
            "null elements inside list<float> rows — no lossless "
            "representation (they would decode as NaN); clean the column "
            "or use the nullable row wrapper")
    return np.asarray(child).reshape(n, dim)


def matrix_to_list(mat: np.ndarray) -> pa.Array:
    """(n, dim) float32 -> Arrow list<float> (row-major values buffer)."""
    n, dim = mat.shape
    offsets = pa.array(np.arange(n + 1, dtype=np.int32) * dim, type=pa.int32())
    values = pa.array(np.ascontiguousarray(mat).ravel(), type=pa.float32())
    return pa.ListArray.from_arrays(offsets, values)


def _sparse_body(flat: np.ndarray) -> bytes | None:
    """CSR body over the column-major flat f32 plane, or None when the
    matrix is too dense for the attempt to be worth sizing (nnz ≥ half —
    positions + 4 B/value cannot beat 4 B/entry plain there)."""
    bits32 = flat.view(np.int32)
    nz = np.flatnonzero(bits32 != 0)
    if 2 * len(nz) >= len(bits32):
        return None
    from ..selector import encode_int_block  # lazy: avoids a cycle
    return (blocks.put_uvarint(len(nz))
            + blocks.put_sub(encode_int_block(nz.astype(np.int64)))
            + flat[nz].tobytes())


def encode(mat: np.ndarray, precision: str | None = None) -> bytes:
    """(n, dim) float32 matrix -> payload bytes (no block header)."""
    n, dim = mat.shape
    header = blocks.put_uvarint(dim)
    if n == 0 or dim == 0:
        return header + bytes([_MODE_PLAIN])
    planes = np.asfortranarray(mat, dtype=np.float32)  # column-major
    flat = planes.ravel(order="F")
    widened = flat.astype(np.float64)
    prec = precision or LOSSLESS
    body = f64lossy.encode(widened.view(np.int64), prec)
    if precision is not None:
        return header + bytes([_MODE_OF_PRECISION[prec]]) + body
    # lossless cost gate over three candidates; plain listed first so it
    # wins exact ties (the pre-sparse gate's rule — structured forms must
    # be STRICTLY smaller), guaranteeing encoded ≤ plain f32 always
    plain = planes.tobytes(order="F")
    cands = [(_MODE_PLAIN, plain), (_MODE_OF_PRECISION[prec], body)]
    sparse = _sparse_body(flat)
    if sparse is not None:
        cands.append((_MODE_SPARSE, sparse))
    mode, best = min(cands, key=lambda c: len(c[1]))
    return header + bytes([mode]) + best


def decode(buf: bytes | memoryview, n_rows: int) -> pa.Array:
    """payload bytes -> Arrow list<float> array of n_rows rows."""
    mv = memoryview(buf)
    dim, pos = blocks.take_uvarint(mv, 0)
    mode = mv[pos]
    pos += 1
    if n_rows == 0 or dim == 0:
        return pa.ListArray.from_arrays(
            pa.array(np.zeros(n_rows + 1, dtype=np.int32), type=pa.int32()),
            pa.array(np.empty(0, dtype=np.float32), type=pa.float32()))
    total = n_rows * dim
    if mode == _MODE_PLAIN:
        flat = np.frombuffer(mv[pos:pos + 4 * total], dtype=np.float32)
    elif mode == _MODE_SPARSE:
        nz_pos, vals = _sparse_parts(mv, pos)
        flat = np.zeros(total, dtype=np.float32)
        flat[nz_pos] = vals
    else:
        bits = f64lossy.decode(mv[pos:], total)
        wide = bits.view(np.float64)
        # saturate the f64→f32 cast: lossy rounding can push a finite
        # near-FLT_MAX value past the f32 range — clamp to ±FLT_MAX so a
        # finite input never decodes to Inf (same rationale as f64lossy's
        # DBL_MAX carry clamp; true ±Inf pass through untouched)
        fmax = np.float64(np.finfo(np.float32).max)
        finite = np.isfinite(wide)
        wide = np.where(finite, np.clip(wide, -fmax, fmax), wide)
        flat = wide.astype(np.float32)
    mat = flat.reshape(n_rows, dim, order="F")  # undo column-major
    return matrix_to_list(mat)


def _sparse_parts(mv: memoryview, pos: int) -> tuple[np.ndarray, np.ndarray]:
    """sparse body -> (sorted flat positions int64, values f32 view)."""
    from ..selector import decode_int_block  # lazy: avoids a cycle
    nnz, pos = blocks.take_uvarint(mv, pos)
    pos_blk, pos = blocks.take_sub(mv, pos)
    nz_pos = decode_int_block(pos_blk)
    vals = np.frombuffer(mv[pos:pos + 4 * nnz], dtype=np.float32)
    return nz_pos, vals


def encoded_size(mat: np.ndarray, precision: str | None = None) -> int:
    """Exact (like segdelta/f64lossy: sized by construction — this codec is
    selected by column KIND, not by the int cost-gate sweep; its internal
    gate already guarantees encoded ≤ plain f32)."""
    return len(encode(mat, precision))


def encode_block(arr: pa.Array, precision: str | None = None) -> bytes:
    """Self-describing block over a no-null list<float> Arrow array."""
    mat = list_to_matrix(arr)
    return blocks.pack_block(blocks.MATRIX_F32, len(arr), encode(mat, precision))


def get_row(block: bytes | memoryview, i: int) -> np.ndarray:
    """Per-entry access — the reference dimension codec's defining
    operation (varintDimensionGetEntry, src/varintDimension.c:131-353):
    read row ``i`` of the encoded matrix touching O(dim) values, never the
    whole block, in EVERY mode. Value (i, j) lives at flat index j*n + i
    of the column-major payload:

    * plain mode — one strided gather over a zero-copy f32 view;
    * f64lossy modes — f64lossy.get_positions: the sign/exponent
      sub-blocks answer point lookups via random_access.get_at, the
      mantissa plane is a fixed-stride bit slice, and only the 1-bit
      specials bitmap pays a rank scan (O(n*dim/8) bytes — ~23× smaller
      than the mantissa plane it avoids decoding)."""
    cid, n_rows, payload = blocks.unpack_block(block)
    if cid != blocks.MATRIX_F32:
        raise ValueError(f"not a matrix block: codec {cid}")
    if not 0 <= i < n_rows:
        raise IndexError(i)
    mv = memoryview(payload)
    dim, pos = blocks.take_uvarint(mv, 0)
    mode = mv[pos]
    pos += 1
    if mode == _MODE_PLAIN:
        flat = np.frombuffer(mv[pos:pos + 4 * n_rows * dim], dtype=np.float32)
        return np.ascontiguousarray(flat[i::n_rows])  # one strided gather
    if mode == _MODE_SPARSE:
        # the position index (nnz small ints, the compressed part) is
        # decoded; the VALUES plane is only touched at the row's hits
        nz_pos, vals = _sparse_parts(mv, pos)
        if len(nz_pos) == 0:  # legal: an all-(+0.0) chunk encodes as nnz=0
            return np.zeros(dim, dtype=np.float32)
        wanted = i + n_rows * np.arange(dim, dtype=np.int64)
        j = np.searchsorted(nz_pos, wanted)
        j_safe = np.minimum(j, len(nz_pos) - 1)
        hit = (j < len(nz_pos)) & (nz_pos[j_safe] == wanted)
        out = np.zeros(dim, dtype=np.float32)
        out[hit] = vals[j[hit]]
        return out
    flat_pos = i + n_rows * np.arange(dim, dtype=np.int64)
    bits = f64lossy.get_positions(mv[pos:], n_rows * dim, flat_pos)
    wide = bits.view(np.float64)
    # same saturating f64->f32 cast as decode()
    fmax = np.float64(np.finfo(np.float32).max)
    finite = np.isfinite(wide)
    wide = np.where(finite, np.clip(wide, -fmax, fmax), wide)
    return wide.astype(np.float32)
