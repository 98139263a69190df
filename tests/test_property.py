"""Hypothesis property tests for the pure kernels (word packing,
representations, minhash banding math)."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from sfa_spark.functions import representations as R
from sfa_spark.functions import spectral
from sfa_spark.operators.words import binlog


@given(
    st.lists(st.integers(min_value=0, max_value=7), min_size=1, max_size=20),
    st.sampled_from([2, 4, 8]),
)
def test_word_pack_bit_layout(symbols, alphabet):
    symbols = [s % alphabet for s in symbols]
    bits = binlog(alphabet)
    word = sum(s << (bits * i) for i, s in enumerate(symbols))
    # unpack must invert pack for any symbol sequence that fits 60 bits
    if bits * len(symbols) <= 60:
        back = [(word >> (bits * i)) & ((1 << bits) - 1) for i in range(len(symbols))]
        assert back == symbols


@settings(deadline=None, max_examples=25)
@given(
    st.lists(
        st.floats(min_value=-100, max_value=100, allow_nan=False),
        min_size=8,
        max_size=64,
    ),
    st.sampled_from([2, 4, 8]),
)
def test_paa_mean_preservation(vals, l):
    """Weighted PAA segment means average back to the series mean."""
    x = np.array(vals)
    coefs = R.paa_values(x, l)
    assert np.isclose(coefs.mean(), x.mean(), atol=1e-6)


@settings(deadline=None, max_examples=25)
@given(
    st.lists(
        st.floats(min_value=-10, max_value=10, allow_nan=False),
        min_size=4,
        max_size=64,
    )
)
def test_dwt_parseval_full_length(vals):
    """Orthonormal Haar preserves energy (zero-padded to pow2)."""
    x = np.array(vals)
    n2 = 1
    while n2 < len(x):
        n2 *= 2
    padded = np.zeros(n2)
    padded[: len(x)] = x
    c = R.dwt_values(x, n2)
    assert np.isclose((c**2).sum(), (padded**2).sum(), rtol=1e-9, atol=1e-9)


@settings(deadline=None, max_examples=20)
@given(
    st.lists(
        st.floats(min_value=-10, max_value=10, allow_nan=False),
        min_size=20,
        max_size=80,
    ),
    st.integers(min_value=4, max_value=16),
)
def test_mft_window_count(vals, w):
    x = np.array(vals)
    if len(x) < w:
        return
    out = spectral.mft_all_windows(x, w, 4)
    assert out.shape == (len(x) - w + 1, 4)


@settings(deadline=None, max_examples=25)
@given(
    st.lists(
        st.floats(min_value=-50, max_value=50, allow_nan=False),
        min_size=8,
        max_size=48,
    )
)
def test_apca_reconstruction_error_bounded_by_variance(vals):
    """Piecewise-constant fit can never beat-the-mean by being worse
    than the single-segment (global mean) approximation."""
    x = np.array(vals)
    c = R.apca_values(x, 8)
    rec = R.apca_inverse(c, len(x))
    err = ((rec - x) ** 2).sum()
    global_err = ((x - x.mean()) ** 2).sum()
    assert err <= global_err + 1e-6


@given(
    st.lists(
        st.text(alphabet="abcd", min_size=1, max_size=8),
        min_size=1,
        max_size=40,
    ),
    st.integers(min_value=1, max_value=30),
)
@settings(max_examples=60, deadline=None)
def test_bpe_encode_reproduces_fit_segmentation(words, n_merges):
    """The equivalence the q_bpe_tokens oracle rests on: encoding a
    training word with the learned rank dict (lowest-rank-first, the
    production encode) yields EXACTLY the fit loop's final
    segmentation of that word — for any corpus and merge budget."""
    from collections import Counter

    from sfa_spark.operators.bpe import END, _encode_word, _fit_merges

    vocab = dict(Counter(words))
    # replicate _fit_merges' internal state to capture final seqs
    seqs = [
        (list(w[:-1]) + [w[-1] + END], c) for w, c in sorted(vocab.items())
    ]
    merges = _fit_merges(vocab, n_merges, min_freq=2)
    for a, b in merges:
        nxt = []
        for sym, c in seqs:
            out, i = [], 0
            while i < len(sym):
                if i + 1 < len(sym) and sym[i] == a and sym[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            nxt.append((out, c))
        seqs = nxt
    ranks = {(a, b): i for i, (a, b) in enumerate(merges)}
    for w in vocab:
        fit_seg = next(
            s for (s, _), ww in zip(seqs, sorted(vocab)) if ww == w
        )
        assert _encode_word(w, ranks) == fit_seg, (w, merges)


@given(st.integers(min_value=1, max_value=64), st.integers(min_value=0))
@settings(max_examples=80, deadline=None)
def test_packed_word_hamming_equals_string_hamming(bits, seed):
    """The popcount rewrite of phash_neardup_pairs: Hamming over
    packed 32-bit words (bit_count(xor) per word) equals the per-
    character diff count over the bit strings, for any width ≤ 64."""
    import numpy as np

    rng = np.random.default_rng(seed % (2**32))
    a = "".join(rng.choice(["0", "1"], size=bits))
    b = "".join(rng.choice(["0", "1"], size=bits))
    want = sum(x != y for x, y in zip(a, b))
    n_words = (bits + 31) // 32
    got = 0
    for w in range(n_words):
        wa = int(a[w * 32 : min(bits, (w + 1) * 32)] or "0", 2)
        wb = int(b[w * 32 : min(bits, (w + 1) * 32)] or "0", 2)
        got += bin(wa ^ wb).count("1")
    assert got == want
