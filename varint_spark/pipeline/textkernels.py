"""Corpus-plane rolling-hash kernels — the vectorization backbone of the
text pipeline (minhash shingles, n-gram Jaccard sets, winnowing
fingerprints).

The naive shape loops ``for t in texts`` and vectorizes only *within* a
document; with billions of short documents the Python loop dominates.
Here the whole Arrow batch is flattened to ONE byte plane + offsets
(exactly like codecs.strings.to_plane) and every window hash in the batch
is computed with O(plane) vector ops, no per-document Python:

    h(j, w) = sum_k  b[j+k] * base^(w-1-k)                (mod 2^64)
            = base^(j+w-1) * (T[j+w] - T[j])              (mod 2^64)
    where T[m] = sum_{k<m} b[k] * base^(-k)               (mod 2^64)

``base`` is odd, so it is invertible mod 2^64 and the prefix sums /
power tables are plain uint64 cumulative ops that wrap to exactly the
modular values. This reproduces, bit for bit, the per-document recurrence
``h = h*base + b[k]`` the pipeline shipped with (same window hashes), in
~6 vector passes total regardless of window width.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

FNV_BASE = np.uint64(1099511628211)
_U64 = np.uint64


def to_plane(texts: pd.Series) -> tuple[np.ndarray, np.ndarray]:
    """Series of strings -> (uint8 byte plane, int64 offsets[n+1])."""
    bs = [t.encode("utf-8", "surrogatepass") for t in texts]
    offsets = np.zeros(len(bs) + 1, dtype=np.int64)
    np.cumsum([len(b) for b in bs], out=offsets[1:])
    plane = np.frombuffer(b"".join(bs), dtype=np.uint8)
    return plane, offsets


def arrow_plane(arr) -> tuple[np.ndarray, np.ndarray]:
    """Arrow string array -> (uint8 byte plane, int64 offsets[n+1]),
    ZERO-COPY: Arrow's variable-length string layout is already exactly
    [offsets buffer][contiguous utf-8 data buffer], so inside a UDF the
    corpus plane costs two np.frombuffer views instead of a per-document
    encode loop (the dominant cost of to_plane). Nulls hash as empty."""
    import pyarrow as pa

    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if arr.null_count:
        arr = arr.fill_null("")
    arr = arr.cast(pa.large_utf8())  # 64-bit offsets, one dtype to handle
    off_buf, data_buf = arr.buffers()[1], arr.buffers()[2]
    offs = np.frombuffer(off_buf, dtype=np.int64)[arr.offset: arr.offset + len(arr) + 1]
    data = np.frombuffer(data_buf, dtype=np.uint8) if data_buf is not None \
        else np.empty(0, dtype=np.uint8)
    plane = data[offs[0]: offs[-1]]
    return plane, (offs - offs[0]).astype(np.int64)


_POW_CACHE: dict[int, tuple[np.ndarray, np.ndarray]] = {}


def _pow_tables(base: np.uint64, n: int) -> tuple[np.ndarray, np.ndarray]:
    """(base^k, base^-k) for k=0..n, mod 2^64 — cached per base and grown
    geometrically, so steady-state batches pay zero table cost."""
    cached = _POW_CACHE.get(int(base))
    if cached is not None and len(cached[0]) > n:
        return cached[0][: n + 1], cached[1][: n + 1]
    size = max(n, 1 << 20, 0 if cached is None else 2 * (len(cached[0]) - 1))
    inv = _U64(pow(int(base), -1, 1 << 64))
    pw = np.empty(size + 1, dtype=np.uint64)
    ipw = np.empty(size + 1, dtype=np.uint64)
    pw[0] = ipw[0] = 1
    np.multiply.accumulate(np.full(size, base, dtype=np.uint64), out=pw[1:])
    np.multiply.accumulate(np.full(size, inv, dtype=np.uint64), out=ipw[1:])
    _POW_CACHE[int(base)] = (pw, ipw)
    return pw[: n + 1], ipw[: n + 1]


def _valid_window_mask(offsets: np.ndarray, width: int, N: int) -> np.ndarray:
    """Boolean mask over window starts 0..N-width: True iff the window
    [j, j+width) lies entirely inside one document. Built by range-marking
    each internal document boundary (one np.add.at over #docs, one cumsum)
    — no per-window gather."""
    n_win = N - width + 1
    bnds = offsets[1:-1]
    lo = np.maximum(bnds - width + 1, 0)
    hi = np.minimum(bnds, n_win)
    keep = lo < hi
    # bincount instead of np.add.at: same scatter-add, ~10x faster
    dif = np.bincount(lo[keep], minlength=n_win + 1).astype(np.int32)
    dif -= np.bincount(hi[keep], minlength=n_win + 1).astype(np.int32)
    return np.cumsum(dif[:n_win]) == 0


def window_hashes(plane: np.ndarray, offsets: np.ndarray, width: int,
                  base: np.uint64 = FNV_BASE) -> tuple[np.ndarray, np.ndarray]:
    """All ``width``-window hashes per document, vectorized across the batch.

    Returns (hashes uint64, hoffs int64[n+1]): document d's window hashes
    are ``hashes[hoffs[d]:hoffs[d+1]]`` in window order. Documents shorter
    than ``width`` contribute exactly one fallback hash — the plain byte
    sum (0 when empty) — matching the per-document kernels these replace.

    Hot path is all contiguous slices: hashes for EVERY plane position are
    computed with sliced vector ops (no gathers), then windows crossing a
    document boundary are compressed out with one boolean mask.
    """
    n = len(offsets) - 1
    lens = np.diff(offsets)
    counts = np.where(lens >= width, lens - width + 1, 1)
    hoffs = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(counts, out=hoffs[1:])
    out = np.zeros(hoffs[-1], dtype=np.uint64)
    if len(plane) == 0:
        return out, hoffs

    long_mask = lens >= width
    if long_mask.any():
        N = len(plane)
        pw, ipw = _pow_tables(base, N)
        bv = plane.astype(np.uint64)
        T = np.zeros(N + 1, dtype=np.uint64)
        np.cumsum(bv * ipw[:N], out=T[1:])  # wraps mod 2^64 = modular value
        h_all = pw[width - 1: N] * (T[width:] - T[: N - width + 1])
        valid = _valid_window_mask(offsets, width, N)
        # valid windows appear in position order == grouped by document
        out[np.repeat(long_mask, counts)] = h_all[valid]

    short = np.flatnonzero(~long_mask & (lens > 0))
    if len(short):
        # byte-sum fallback via reduceat on the short docs' segments
        bounds = np.stack([offsets[short], offsets[short + 1]], axis=1).ravel()
        sums = np.add.reduceat(plane.astype(np.uint64), bounds)[::2]
        out[hoffs[short]] = sums
    return out, hoffs


def unique_per_doc(hashes: np.ndarray, hoffs: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Per-document sorted-unique hash sets, vectorized (lexsort + dedupe
    mask). Returns (uhashes, uoffs[n+1])."""
    n = len(hoffs) - 1
    doc_for = np.repeat(np.arange(n), np.diff(hoffs))
    order = np.lexsort((hashes, doc_for))
    h = hashes[order]
    d = doc_for[order]
    keep = np.ones(len(h), dtype=bool)
    keep[1:] = (h[1:] != h[:-1]) | (d[1:] != d[:-1])
    uh, ud = h[keep], d[keep]
    uoffs = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(np.bincount(ud, minlength=n), out=uoffs[1:])
    return uh, uoffs


def min_per_doc(hashes: np.ndarray, hoffs: np.ndarray) -> np.ndarray:
    """Per-document min hash (every document has >= 1 hash by construction)."""
    if len(hashes) == 0:
        return np.zeros(len(hoffs) - 1, dtype=np.uint64)
    return np.minimum.reduceat(hashes, hoffs[:-1])


def pair_jaccard(ha: np.ndarray, aoffs: np.ndarray,
                 hb: np.ndarray, boffs: np.ndarray) -> np.ndarray:
    """Row-wise Jaccard of per-row hash SETS (inputs from unique_per_doc),
    vectorized: concatenate both sides keyed by row, sort, count adjacent
    equal values within a row = |A ∩ B|."""
    n = len(aoffs) - 1
    na, nb = np.diff(aoffs), np.diff(boffs)
    rows = np.concatenate([np.repeat(np.arange(n), na), np.repeat(np.arange(n), nb)])
    vals = np.concatenate([ha, hb])
    order = np.lexsort((vals, rows))
    r, v = rows[order], vals[order]
    dup = np.zeros(len(v), dtype=np.int64)
    if len(v) > 1:
        dup[1:] = ((v[1:] == v[:-1]) & (r[1:] == r[:-1])).astype(np.int64)
    inter = np.bincount(r, weights=dup, minlength=n).astype(np.int64)
    union = na + nb - inter
    return inter / np.maximum(union, 1)


def fingerprint_per_doc(plane: np.ndarray, offsets: np.ndarray, window: int,
                        base: np.uint64 = FNV_BASE) -> np.ndarray:
    """Winnowing fingerprint per document: min rolling hash over
    ``window``-byte windows; documents shorter than the window hash as one
    whole-document window (w = len, the legacy per-document semantics);
    empty documents -> 0. Returns int64 (top bit masked off)."""
    n = len(offsets) - 1
    lens = np.diff(offsets)
    out = np.zeros(n, dtype=np.uint64)
    if len(plane):
        N = len(plane)
        pw, ipw = _pow_tables(base, N)
        bv = plane.astype(np.uint64)
        T = np.zeros(N + 1, dtype=np.uint64)
        np.cumsum(bv * ipw[:N], out=T[1:])
        long_mask = lens >= window
        if long_mask.any():
            # contiguous-slice hashes for every position + boundary mask
            # (same no-gather hot path as window_hashes)
            h_all = pw[window - 1: N] * (T[window:] - T[: N - window + 1])
            valid = _valid_window_mask(offsets, window, N)
            docs = np.flatnonzero(long_mask)
            wcounts = (lens - window + 1)[docs]
            seg = np.zeros(len(docs), dtype=np.int64)
            np.cumsum(wcounts[:-1], out=seg[1:])
            out[docs] = np.minimum.reduceat(h_all[valid], seg)
        short = np.flatnonzero(~long_mask & (lens > 0))
        if len(short):  # one whole-document window (w = len)
            s, e = offsets[short], offsets[short + 1]
            out[short] = pw[e - 1] * (T[e] - T[s])
    return (out & _U64(0x7FFFFFFFFFFFFFFF)).astype(np.int64)


# ---- whitespace-token kernels (simhash) -------------------------------------


def _is_ws(plane: np.ndarray) -> np.ndarray:
    # Java regex \s = [ \t\n\x0B\f\r] (bytes {9..13, 32}) — the boundaries
    # split(r"\s+") produces. Multi-byte UTF-8 sequences never contain
    # these byte values, so a byte-plane scan is exact on any input.
    return ((plane >= 9) & (plane <= 13)) | (plane == 32)


def token_bounds(plane: np.ndarray, offsets: np.ndarray
                 ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Whitespace-token boundaries for the whole batch from the byte plane.

    Returns (starts, lens, toffs[n+1]): token t occupies
    ``plane[starts[t] : starts[t] + lens[t]]`` and document d's tokens are
    ``toffs[d] <= t < toffs[d+1]``. Tokens are maximal runs of
    non-whitespace bytes that never cross a document boundary; documents
    of only whitespace contribute zero tokens (split + length>0 filter
    semantics). All vector ops — no per-document or per-token loop.
    """
    N = len(plane)
    n = len(offsets) - 1
    if N == 0:
        z = np.zeros(0, dtype=np.int64)
        return z, z, np.zeros(n + 1, dtype=np.int64)
    sep = _is_ws(plane)
    nonsep = ~sep
    prev_sep = np.empty(N, dtype=bool)
    prev_sep[0] = True
    prev_sep[1:] = sep[:-1]
    next_sep = np.empty(N, dtype=bool)
    next_sep[-1] = True
    next_sep[:-1] = sep[1:]
    bnds = offsets[1:-1]
    prev_sep[bnds[bnds < N]] = True       # doc start forces a token start
    next_sep[bnds[bnds > 0] - 1] = True   # doc end forces a token end
    starts = np.flatnonzero(nonsep & prev_sep).astype(np.int64)
    ends = np.flatnonzero(nonsep & next_sep).astype(np.int64) + 1
    toffs = np.searchsorted(starts, offsets).astype(np.int64)
    return starts, ends - starts, toffs


_M64 = (1 << 64) - 1
_XXP1 = np.uint64(0x9E3779B185EBCA87)
_XXP2 = np.uint64(0xC2B2AE3D27D4EB4F)
_XXP3 = np.uint64(0x165667B19E3779F9)
_XXP4 = np.uint64(0x85EBCA77C2B2AE63)
_XXP5 = np.uint64(0x27D4EB2F165667C5)


def _rotl(x: np.ndarray, r: int) -> np.ndarray:
    return (x << np.uint64(r)) | (x >> np.uint64(64 - r))


def _xxh64_fixed(mat: np.ndarray, L: int, seed: int) -> np.ndarray:
    """xxHash64 of every row of an (m, L) uint8 matrix (one length bucket:
    the algorithm's control flow depends only on L, so all m rows run the
    identical instruction sequence, vectorized)."""
    u8 = mat.astype(np.uint64)
    m = mat.shape[0]

    def u64(o: int) -> np.ndarray:
        v = u8[:, o].copy()
        for k in range(1, 8):
            v |= u8[:, o + k] << np.uint64(8 * k)
        return v

    o = 0
    if L >= 32:
        v1 = np.full(m, np.uint64((seed + int(_XXP1) + int(_XXP2)) & _M64))
        v2 = np.full(m, np.uint64((seed + int(_XXP2)) & _M64))
        v3 = np.full(m, np.uint64(seed))
        v4 = np.full(m, np.uint64((seed - int(_XXP1)) & _M64))
        while o + 32 <= L:
            v1 = _rotl(v1 + u64(o) * _XXP2, 31) * _XXP1
            v2 = _rotl(v2 + u64(o + 8) * _XXP2, 31) * _XXP1
            v3 = _rotl(v3 + u64(o + 16) * _XXP2, 31) * _XXP1
            v4 = _rotl(v4 + u64(o + 24) * _XXP2, 31) * _XXP1
            o += 32
        h = _rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)
        for v in (v1, v2, v3, v4):
            h = (h ^ (_rotl(v * _XXP2, 31) * _XXP1)) * _XXP1 + _XXP4
    else:
        h = np.full(m, np.uint64((seed + int(_XXP5)) & _M64))
    h = h + np.uint64(L)
    while o + 8 <= L:
        h = _rotl(h ^ (_rotl(u64(o) * _XXP2, 31) * _XXP1), 27) * _XXP1 + _XXP4
        o += 8
    if o + 4 <= L:
        v = u8[:, o].copy()
        for k in range(1, 4):
            v |= u8[:, o + k] << np.uint64(8 * k)
        h = _rotl(h ^ (v * _XXP1), 23) * _XXP2 + _XXP3
        o += 4
    while o < L:
        h = _rotl(h ^ (u8[:, o] * _XXP5), 11) * _XXP1
        o += 1
    h ^= h >> np.uint64(33)
    h *= _XXP2
    h ^= h >> np.uint64(29)
    h *= _XXP3
    h ^= h >> np.uint64(32)
    return h


def xxhash64_strings(plane: np.ndarray, starts: np.ndarray, lens: np.ndarray,
                     seed: int = 42) -> np.ndarray:
    """Vectorized xxHash64 over (start, len) slices of the byte plane —
    the exact function behind Spark's ``F.xxhash64`` on a string column
    (seed 42 over the utf-8 bytes; verified bit-identical in tests).
    Slices are bucketed by exact length; loops run over distinct lengths
    and byte positions, never over tokens."""
    out = np.zeros(len(starts), dtype=np.uint64)
    for L in np.unique(lens):
        idx = np.flatnonzero(lens == L)
        L = int(L)
        mat = plane[starts[idx, None] + np.arange(L, dtype=np.int64)] \
            if L else np.zeros((len(idx), 0), dtype=np.uint8)
        out[idx] = _xxh64_fixed(mat, L, seed)
    return out


_MODPOW_CACHE: dict[int, np.ndarray] = {}


def _mod_pow_table(base: int, n: int, mod: int = 2147483647) -> np.ndarray:
    """base^k mod ``mod`` for k = 0..n-1, built by vectorized doubling
    (log2(n) array passes) and cached per base."""
    pw = _MODPOW_CACHE.get(base)
    if pw is None or len(pw) < n:
        pw = np.ones(1, dtype=np.int64)
        while len(pw) < n:
            f = (int(pw[-1]) * base) % mod
            pw = np.concatenate([pw, (pw * f) % mod])
        _MODPOW_CACHE[base] = pw
    return pw[:n]


def portable_hash_strings(plane: np.ndarray, starts: np.ndarray,
                          lens: np.ndarray) -> np.ndarray:
    """The SQL-twin 62-bit token hash: two left folds
    ``h = (h*base + codepoint) % (2^31 - 1)`` over the token's CODEPOINTS
    (bases 31 and 37), combined as ``fold31 * 2^31 + fold37`` — exactly
    what the DuckDB oracle's list_reduce recomputes. Non-ASCII planes are
    decoded to a codepoint plane in one C-level pass, so the byte-vs-
    codepoint divergence that restricts portable_window_min cannot occur.
    """
    n = len(starts)
    if n == 0:
        return np.zeros(0, dtype=np.int64)
    if len(plane) and int(plane.max()) > 127:
        cps = np.frombuffer(
            plane.tobytes().decode("utf-8", "surrogatepass").encode("utf-32-le"),
            dtype=np.uint32).astype(np.int64)
        char_pos = np.cumsum((plane & 0xC0) != 0x80) - 1
        cstarts = char_pos[starts]
        clens = char_pos[starts + lens - 1] + 1 - cstarts
    else:
        cps = plane.astype(np.int64)
        cstarts, clens = starts, lens
    seg = np.zeros(n, dtype=np.int64)
    np.cumsum(clens[:-1], out=seg[1:])
    total = int(seg[-1] + clens[-1])
    within = np.arange(total, dtype=np.int64) - np.repeat(seg, clens)
    c = cps[np.repeat(cstarts, clens) + within]
    e = np.repeat(clens, clens) - 1 - within  # weight exponent per codepoint
    mod = 2147483647
    folds = []
    for base in (31, 37):
        pw = _mod_pow_table(base, int(clens.max()))
        contrib = (c % mod) * pw[e] % mod  # < 2^31; token sums can't overflow
        folds.append(np.add.reduceat(contrib, seg) % mod)
    return folds[0] * 2147483648 + folds[1]


def simhash_from_hashes(hashes: np.ndarray, toffs: np.ndarray
                        ) -> tuple[np.ndarray, np.ndarray]:
    """Per-document 64-bit SimHash from per-token hashes: bit i of the
    result is 1 iff the signed sum (+1 if token-hash bit i set, else −1)
    over the document's tokens is > 0. Documents with zero tokens emit no
    value. Returns (simhash int64 per non-empty doc, non-empty doc mask).
    The 64-iteration loop is over BITS; each pass is one shift/mask and one
    np.add.reduceat over the token axis — no per-document work."""
    counts = np.diff(toffs)
    ne = counts > 0
    seg = toffs[:-1][ne]
    nt = counts[ne]
    acc = np.zeros(len(seg), dtype=np.uint64)
    if len(seg):
        h = hashes if hashes.dtype == np.uint64 else hashes.view(np.uint64)
        for i in range(64):
            ones = np.add.reduceat(
                ((h >> np.uint64(i)) & np.uint64(1)).astype(np.int64), seg)
            acc |= (2 * ones > nt).astype(np.uint64) << np.uint64(i)
    return acc.view(np.int64), ne


# ---- portable (SQL-expressible) modular variant -----------------------------

PORTABLE_MOD = np.int64(2147483647)  # 2^31 - 1
PORTABLE_BASE = np.int64(31)


def portable_window_min(plane: np.ndarray, offsets: np.ndarray, width: int,
                        base: int = int(PORTABLE_BASE),
                        mod: int = int(PORTABLE_MOD)) -> np.ndarray:
    """Per-document min over ``width``-window polynomial hashes computed
    mod a small prime — the recurrence ``h = (h*base + byte) % mod`` that
    ANSI SQL (DuckDB list_reduce over codepoints) can reproduce exactly.
    Documents shorter than ``width`` yield 0 (documented; the production
    64-bit kernel keeps the byte-sum fallback instead). Vectorized: the
    width-step loop is over ``width`` constants, never over documents.

    ASCII-only by contract: this kernel hashes BYTES while its SQL twin
    hashes CODEPOINTS — they agree iff every byte < 0x80. Non-ASCII input
    fails loudly here instead of silently diverging from the oracle
    (ADVICE r2); the production 64-bit kernel has no such restriction."""
    if len(plane) and int(plane.max()) > 127:
        raise ValueError(
            "portable_window_min requires ASCII text (byte-hash == "
            "codepoint-hash only below 0x80); filter or use the default "
            "64-bit kernel for non-ASCII corpora")
    n = len(offsets) - 1
    lens = np.diff(offsets)
    out = np.zeros(n, dtype=np.int64)
    long_mask = lens >= width
    if not long_mask.any():
        return out
    N = len(plane)
    bv = plane.astype(np.int64)
    h = np.zeros(max(N - width + 1, 0), dtype=np.int64)
    for k in range(width):
        h = (h * base + bv[k : N - width + 1 + k]) % mod
    # valid window starts per long doc: [s_d, e_d - width]
    docs = np.flatnonzero(long_mask)
    wcounts = (lens - width + 1)[docs]
    doc_for = np.repeat(np.arange(len(docs)), wcounts)
    seg_starts = np.zeros(len(docs), dtype=np.int64)
    np.cumsum(wcounts[:-1], out=seg_starts[1:])
    within = np.arange(len(doc_for), dtype=np.int64) - seg_starts[doc_for]
    j = offsets[docs][doc_for] + within
    starts = np.zeros(len(docs), dtype=np.int64)
    np.cumsum(wcounts[:-1], out=starts[1:])
    out[docs] = np.minimum.reduceat(h[j], starts)
    return out
