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
                     precision full/high/medium/low over the widened planes
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


def encode(mat: np.ndarray, precision: str | None = None) -> bytes:
    """(n, dim) float32 matrix -> payload bytes (no block header)."""
    n, dim = mat.shape
    header = blocks.put_uvarint(dim)
    if n == 0 or dim == 0:
        return header + bytes([_MODE_PLAIN])
    planes = np.asfortranarray(mat, dtype=np.float32)  # column-major
    widened = planes.ravel(order="F").astype(np.float64)
    prec = precision or LOSSLESS
    body = f64lossy.encode(widened.view(np.int64), prec)
    plain = planes.tobytes(order="F")
    if precision is None and len(body) >= len(plain):
        # lossless cost gate: structured encoding lost — store raw f32
        return header + bytes([_MODE_PLAIN]) + plain
    return header + bytes([_MODE_OF_PRECISION[prec]]) + body


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
    flat_pos = i + n_rows * np.arange(dim, dtype=np.int64)
    bits = f64lossy.get_positions(mv[pos:], n_rows * dim, flat_pos)
    wide = bits.view(np.float64)
    # same saturating f64->f32 cast as decode()
    fmax = np.float64(np.finfo(np.float32).max)
    finite = np.isfinite(wide)
    wide = np.where(finite, np.clip(wide, -fmax, fmax), wide)
    return wide.astype(np.float32)
