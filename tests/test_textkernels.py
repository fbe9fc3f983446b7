"""Corpus-plane rolling-hash kernels: bit-for-bit parity with the
per-document recurrences they replaced (minhash shingles, jaccard sets,
winnowing fingerprints), including empty / sub-window / multibyte docs."""

from __future__ import annotations

import numpy as np
import pandas as pd

from varint_spark.pipeline import textkernels as tk

FNV = np.uint64(1099511628211)


def _legacy_shingles(texts, width):
    """The original per-document kernel (pre-vectorization), kept here as
    the spec the plane kernel must reproduce."""
    out = []
    for t in texts:
        b = np.frombuffer(t.encode("utf-8", "surrogatepass"), dtype=np.uint8)
        if len(b) < width:
            out.append(np.zeros(1, dtype=np.uint64) if len(b) == 0
                       else np.array([b.astype(np.uint64).sum()], dtype=np.uint64))
            continue
        h = np.zeros(len(b) - width + 1, dtype=np.uint64)
        for k in range(width):
            h = h * FNV + b[k : len(b) - width + 1 + k].astype(np.uint64)
        out.append(np.unique(h))
    return out


def _legacy_fingerprint(t, window=16):
    b = np.frombuffer(t.encode("utf-8", "surrogatepass"), dtype=np.uint8)
    if len(b) == 0:
        return 0
    w = min(window, len(b))
    h = np.zeros(len(b) - w + 1, dtype=np.uint64)
    for k in range(w):
        h = h * FNV + b[k : len(b) - w + 1 + k].astype(np.uint64)
    return int(h.min() & np.uint64(0x7FFFFFFFFFFFFFFF))


def _fixture(seed=0, n=300):
    rng = np.random.default_rng(seed)
    texts = ["".join(chr(rng.integers(32, 600)) for _ in range(rng.integers(0, 120)))
             for _ in range(n)]
    texts += ["", "a", "ab", "abcd", "abcde", "abcdefghijklmno", "abcdefghijklmnop",
              "x" * 3000]
    return pd.Series(texts)


def test_window_hashes_match_legacy_shingles():
    s = _fixture()
    plane, offs = tk.to_plane(s)
    uh, uoffs = tk.unique_per_doc(*tk.window_hashes(plane, offs, 5))
    legacy = _legacy_shingles(s, 5)
    for i in range(len(s)):
        np.testing.assert_array_equal(np.sort(legacy[i]), uh[uoffs[i]:uoffs[i + 1]])


def test_fingerprint_per_doc_matches_legacy():
    s = _fixture(seed=3)
    plane, offs = tk.to_plane(s)
    got = tk.fingerprint_per_doc(plane, offs, 16)
    want = np.array([_legacy_fingerprint(t) for t in s], dtype=np.int64)
    np.testing.assert_array_equal(got, want)


def test_pair_jaccard_matches_setwise():
    s = _fixture(seed=5, n=200)
    ta, tb = s.iloc[:100].reset_index(drop=True), s.iloc[100:200].reset_index(drop=True)
    pa_, ao = tk.to_plane(ta)
    pb_, bo = tk.to_plane(tb)
    ha, aoffs = tk.unique_per_doc(*tk.window_hashes(pa_, ao, 5))
    hb, boffs = tk.unique_per_doc(*tk.window_hashes(pb_, bo, 5))
    got = tk.pair_jaccard(ha, aoffs, hb, boffs)
    la, lb = _legacy_shingles(ta, 5), _legacy_shingles(tb, 5)
    want = np.array([
        len(np.intersect1d(x, y, assume_unique=True)) / max(len(np.union1d(x, y)), 1)
        for x, y in zip(la, lb)
    ])
    np.testing.assert_array_equal(got, want)
    # identical docs -> exactly 1.0
    same, so = tk.to_plane(pd.Series(["hello world shingles"]))
    h1, o1 = tk.unique_per_doc(*tk.window_hashes(same, so, 5))
    assert tk.pair_jaccard(h1, o1, h1, o1)[0] == 1.0


def test_portable_window_min_matches_naive():
    # ASCII corpus: the portable mode's contract (byte-hash == the SQL
    # oracle's codepoint-hash only below 0x80, enforced below)
    rng = np.random.default_rng(7)
    texts = ["".join(chr(rng.integers(32, 127)) for _ in range(rng.integers(0, 120)))
             for _ in range(300)]
    texts += ["", "a", "abcdefghijklmno", "abcdefghijklmnop", "x" * 3000]
    s = pd.Series(texts)
    plane, offs = tk.to_plane(s)
    got = tk.portable_window_min(plane, offs, 16)
    for i, t in enumerate(s):
        b = t.encode("utf-8", "surrogatepass")
        if len(b) < 16:
            assert got[i] == 0
            continue
        best = min(
            int(np.int64(list(__import__("functools").reduce(
                lambda a, c: [(a[0] * 31 + c) % 2147483647], b[j:j + 16], [0]))[0]))
            for j in range(len(b) - 15)
        )
        assert got[i] == best, i


def test_portable_window_min_rejects_non_ascii():
    """Non-ASCII text must fail LOUDLY in portable mode (byte-hash vs the
    SQL oracle's codepoint-hash silently diverge above 0x7F — ADVICE r2)."""
    import pytest

    plane, offs = tk.to_plane(pd.Series(["héllo wörld, this is long enough"]))
    with pytest.raises(ValueError, match="ASCII"):
        tk.portable_window_min(plane, offs, 16)


def test_no_per_document_python_loops_left():
    """Regression guard for the verdict finding: no `for t in texts`-style
    loops in the pipeline hashing paths."""
    import inspect
    from varint_spark.pipeline import dedup, textstats
    for mod in (dedup, textstats):
        src = inspect.getsource(mod)
        assert "for t in texts" not in src
        assert "for i, t in enumerate(texts)" not in src


# ---- whitespace-token kernels (simhash path) --------------------------------


def test_token_bounds_matches_split():
    import re

    texts = ["hello world", "  leading", "trailing  ", "", "   ", "a",
             "tab\tsep\nlines\x0bvt\fff\rcr", "multi   spaces", "héllo wörld",
             "日本語 テスト mixed ascii", "x" * 100, " \t \n "]
    plane, offs = tk.to_plane(pd.Series(texts))
    starts, lens, toffs = tk.token_bounds(plane, offs)
    for d, t in enumerate(texts):
        got = [plane[starts[i]: starts[i] + lens[i]].tobytes().decode("utf-8")
               for i in range(toffs[d], toffs[d + 1])]
        want = [x for x in re.split("[ \t\n\x0b\f\r]+", t) if x]
        assert got == want, (d, t)


def test_token_bounds_empty_corpus():
    plane, offs = tk.to_plane(pd.Series(["", ""]))
    starts, lens, toffs = tk.token_bounds(plane, offs)
    assert len(starts) == 0 and toffs.tolist() == [0, 0, 0]


def test_portable_hash_strings_matches_codepoint_fold():
    texts = ["hello", "héllo", "日本語", "a", "x" * 500, "Zz0"]
    plane, offs = tk.to_plane(pd.Series(texts))
    starts = offs[:-1].astype(np.int64)
    lens = np.diff(offs).astype(np.int64)
    got = tk.portable_hash_strings(plane, starts, lens)
    mod = 2147483647

    def fold(t, base):
        h = 0
        for ch in t:
            h = (h * base + ord(ch)) % mod
        return h

    want = [fold(t, 31) * 2147483648 + fold(t, 37) for t in texts]
    assert got.tolist() == want


def test_simhash_from_hashes_sign_rule():
    # 3 docs: [b1], [b1, b1, ~b1], [] -> empty doc excluded; ties -> 0 bit
    h = np.array([0b101, 0b101, 0b101, 0b010], dtype=np.uint64)
    toffs = np.array([0, 1, 4, 4], dtype=np.int64)
    sh, ne = tk.simhash_from_hashes(h, toffs)
    assert ne.tolist() == [True, True, False]
    assert sh[0] == 0b101
    # doc 2: bits 0,2 -> +2-1=1>0 set; bit 1 -> -2+1=-1 not set
    assert sh[1] == 0b101
