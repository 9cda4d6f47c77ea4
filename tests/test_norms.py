"""SmallFloat byte4 quantization + BM25 formula (BASELINE.md contract:
k1=1.2, b=0.75, Lucene-default idf/tfn)."""

import math

import numpy as np

from siem_on_amazon_opensearch_service_ray.norms import (
    BYTE4_DECODE, bm25_score, decode_norm, effective_length, encode_norm, idf,
    tf_norm)


def _ref_byte4_to_int(b):
    bits = b & 0x07
    shift = (b >> 3) - 1
    return bits if shift == -1 else (bits | 0x08) << shift


def _ref_int_to_byte4(i):
    # Lucene SmallFloat.intToByte4 (public algorithm): keep top 4 bits
    if i < 8:
        return i
    num_bits = i.bit_length()
    shift = num_bits - 4
    enc = (i >> shift) & 0x07
    return enc | ((shift + 1) << 3)


def test_decode_table_matches_reference_formula():
    for b in range(256):
        assert BYTE4_DECODE[b] == _ref_byte4_to_int(b)


def test_encode_matches_reference_truncation():
    # Lucene intToByte4's domain is a Java int; beyond it we saturate at 255
    lens = np.array(list(range(0, 5000)) + [10**6, 10**9, 2**31 - 1])
    enc = encode_norm(lens)
    for v, e in zip(lens.tolist(), enc.tolist()):
        assert e == _ref_int_to_byte4(v), v


def test_quantization_roundtrip_properties():
    lens = np.arange(0, 100_000)
    q = decode_norm(encode_norm(lens))
    assert np.all(q <= lens)           # truncating
    assert np.all(np.diff(q) >= 0)     # monotone
    assert np.all(q[:16] == lens[:16])  # exact below 16


def test_effective_length_policies():
    lens = np.array([0, 7, 100, 103, 1000])
    assert np.array_equal(effective_length(lens, "exact"), lens)
    q = effective_length(lens, "lucene")
    assert q[2] == q[3]  # 100 and 103 quantize to the same norm


def test_idf_hand_computed():
    # N=100, df=10: ln(1 + 90.5/10.5)
    assert math.isclose(float(idf(10, 100)), math.log(1 + 90.5 / 10.5))


def test_bm25_hand_computed():
    # tf=3, dl=50, avgdl=40, df=5, N=1000, k1=1.2, b=0.75
    tfn = 3 * 2.2 / (3 + 1.2 * (1 - 0.75 + 0.75 * 50 / 40.0))
    expect = math.log(1 + (1000 - 5 + 0.5) / 5.5) * tfn
    got = float(bm25_score(np.array([3]), np.array([50]), 5, 1000, 40.0))
    assert math.isclose(got, expect, rel_tol=1e-12)


def test_tf_norm_monotonicity():
    # increasing in tf, decreasing in dl — the block-max bound relies on it
    tfs = np.arange(1, 100)
    assert np.all(np.diff(tf_norm(tfs, np.full(99, 30), 25.0)) > 0)
    dls = np.arange(1, 100)
    assert np.all(np.diff(tf_norm(np.full(99, 3), dls, 25.0)) < 0)
