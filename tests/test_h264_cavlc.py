"""CAVLC sparse-residual codec (functions/h264_cavlc.py): structural
table validation (prefix-freeness, Kraft completeness where the table
is complete), formula-path exactness (levels, runs, escapes), and
exhaustive encode->decode round-trips over the subset's space."""

from __future__ import annotations

import itertools

import pytest

from streamprocess_spark.functions.h264_cavlc import (
    COEFF_TOKEN_CHROMA_DC,
    RUN_BEFORE,
    TOTAL_ZEROS_4x4,
    TOTAL_ZEROS_CHROMA_DC,
    BitCursor,
    CavlcBoundary,
    _decode_level,
    _encode_level,
    _next_suffix_length,
    _run_before_codes,
    coeff_token_table,
    decode_residual_block,
    encode_residual_block,
)


def _prefix_free(codes):
    codes = list(codes)
    for a, b in itertools.permutations(codes, 2):
        assert not b.startswith(a), f"{a} is a prefix of {b}"


def _kraft(codes) -> float:
    return sum(2.0 ** -len(c) for c in codes)


# ---------------------------------------------------------------- tables

@pytest.mark.parametrize("nc", [-1, 0, 2, 4, 8])
def test_coeff_token_prefix_free(nc):
    _prefix_free(coeff_token_table(nc).values())


def test_coeff_token_chroma_dc_complete():
    # the chroma-DC table is transcribed in full -> must be a complete
    # prefix code (Kraft sum exactly 1)
    assert _kraft(COEFF_TOKEN_CHROMA_DC.values()) == 1.0


def test_coeff_token_flc_is_6_bits():
    t = coeff_token_table(8)
    assert all(len(b) == 6 for b in t.values())
    assert len(set(t.values())) == len(t)  # injective
    assert t[(0, 0)] == "000011"
    assert t[(16, 3)] == format(4 * 15 + 3, "06b")


def test_total_zeros_tables():
    # tc=1 row spans total_zeros 0..15, tc=2 row 0..14; both complete
    assert len(TOTAL_ZEROS_4x4[1]) == 16
    assert len(TOTAL_ZEROS_4x4[2]) == 15
    for row in TOTAL_ZEROS_4x4.values():
        _prefix_free(row)
    # tc=2 tiles the code space exactly; tc=1 leaves the all-zeros
    # 9-bit pattern unused in the spec (Kraft sum 1 - 2^-9)
    assert _kraft(TOTAL_ZEROS_4x4[2]) == 1.0
    assert _kraft(TOTAL_ZEROS_4x4[1]) == 1.0 - 2.0 ** -9
    for tc, row in TOTAL_ZEROS_CHROMA_DC.items():
        assert len(row) == 4 - tc + 1
        _prefix_free(row)
        assert _kraft(row) == 1.0


@pytest.mark.parametrize("zl", list(range(1, 15)))
def test_run_before_columns(zl):
    codes = _run_before_codes(zl)
    _prefix_free(codes)
    if zl <= 6:
        # tabulated columns carry exactly zl+1 codes and are complete
        assert len(codes) == zl + 1
        assert _kraft(codes) == 1.0
        assert codes == RUN_BEFORE[zl]
    else:
        # the formula column defines codes for runs 0..14 regardless of
        # zerosLeft; only indices <= zl are reachable
        assert len(codes) == 15


# ---------------------------------------------------------------- levels

@pytest.mark.parametrize("suffix_length", list(range(0, 7)))
def test_level_roundtrip(suffix_length):
    for level in itertools.chain(range(1, 300), range(-300, 0),
                                 [2047, -2047, 5000, -5000]):
        bits = _encode_level(level, suffix_length)
        cur = BitCursor(bits)
        assert _decode_level(cur, suffix_length) == level, (
            level, suffix_length, bits)
        assert cur.pos == len(bits)  # no trailing bits


def test_level_known_codes():
    """suffixLength 0 head of the ladder is fully determined by the
    formula: levelCode = unary prefix; +1 -> '1', -1 -> '01',
    +2 -> '001', -2 -> '0001', ..."""
    assert _encode_level(1, 0) == "1"
    assert _encode_level(-1, 0) == "01"
    assert _encode_level(2, 0) == "001"
    assert _encode_level(-2, 0) == "0001"
    # prefix 14: 4-bit suffix escape
    assert _encode_level(8, 0) == "0" * 14 + "1" + "0000"
    # suffixLength 2: levelCode = (prefix << 2) + suffix
    assert _encode_level(1, 2) == "1" + "00"
    assert _encode_level(-2, 2) == "1" + "11"
    assert _encode_level(3, 2) == "01" + "00"


def test_suffix_length_state_machine():
    assert _next_suffix_length(0, 1) == 1
    assert _next_suffix_length(0, 4) == 2   # 0->1, |4| > 3<<0
    assert _next_suffix_length(1, 3) == 1
    assert _next_suffix_length(1, 4) == 2
    assert _next_suffix_length(2, 6) == 2
    assert _next_suffix_length(2, 7) == 3
    assert _next_suffix_length(6, 10 ** 6) == 6  # capped


# ------------------------------------------------------------ block codec

def _block(n, pairs):
    out = [0] * n
    for i, v in pairs:
        out[i] = v
    return out


def _roundtrip(coeffs, nc, max_coeffs):
    bits = encode_residual_block(coeffs, nc, max_coeffs)
    cur = BitCursor(bits)
    got = decode_residual_block(cur, nc, max_coeffs)
    assert cur.pos == len(bits), "decoder left trailing bits"
    return got


@pytest.mark.parametrize("nc", [0, 1, 2, 3, 4, 7, 8, 20])
@pytest.mark.parametrize("max_coeffs", [16, 15])
def test_block_roundtrip_exhaustive_sparse(nc, max_coeffs):
    """Every 0-, 1- and 2-coefficient pattern over representative level
    values round-trips bit-exactly: positions x {+-1, +-2, +-9, +-40}."""
    vals = [1, -1, 2, -2, 9, -9, 40, -40]
    assert _roundtrip([0] * max_coeffs, nc, max_coeffs) == [0] * max_coeffs
    for i in range(max_coeffs):
        for v in vals:
            c = _block(max_coeffs, [(i, v)])
            assert _roundtrip(c, nc, max_coeffs) == c, (i, v)
    for i, j in itertools.combinations(range(max_coeffs), 2):
        for v1, v2 in [(1, 1), (-1, 2), (9, -1), (40, 40), (-2, -2)]:
            c = _block(max_coeffs, [(i, v1), (j, v2)])
            assert _roundtrip(c, nc, max_coeffs) == c, (i, j, v1, v2)


def test_chroma_dc_roundtrip_exhaustive():
    """The 2x2 chroma-DC tables are complete, so the FULL coefficient
    space round-trips: all 4 positions, 0..4 nonzero."""
    vals = [0, 1, -1, 3, -7]
    for combo in itertools.product(vals, repeat=4):
        c = list(combo)
        assert _roundtrip(c, -1, 4) == c, c


def test_subset_boundary_raises():
    c = _block(16, [(0, 5), (3, 2), (7, -1)])
    with pytest.raises(CavlcBoundary):
        encode_residual_block(c, 0)
    # decoding a deep coeff_token via the nC>=8 FLC also stops at the
    # boundary rather than mis-parsing
    bits = format(4 * (5 - 1) + 0, "06b")  # TotalCoeff=5 via FLC
    with pytest.raises(CavlcBoundary):
        decode_residual_block(BitCursor(bits + "0" * 64), 8)


def test_trailing_one_sign_bits():
    """[.., +1] vs [.., -1]: one trailing one differs only in its sign
    bit right after coeff_token."""
    up = encode_residual_block(_block(16, [(0, 1)]), 0)
    dn = encode_residual_block(_block(16, [(0, -1)]), 0)
    assert up[:-1] != up and len(up) == len(dn)
    assert up[: len(coeff_token_table(0)[(1, 1)])] == \
        dn[: len(coeff_token_table(0)[(1, 1)])]
    assert up[len(coeff_token_table(0)[(1, 1)])] == "0"
    assert dn[len(coeff_token_table(0)[(1, 1)])] == "1"


def test_known_bitstring_single_coeff():
    """Pin an entire block encoding to hand-derived bits: one +1 at
    scan position 2 of a 4x4 block, nC=0.
    coeff_token(tc=1,t1=1) = '01'; sign '+' = '0';
    total_zeros(tc=1) value 2 = '010'. No runs (single coefficient)."""
    bits = encode_residual_block(_block(16, [(2, 1)]), 0)
    assert bits == "01" + "0" + "010"


def test_known_bitstring_two_coeffs_with_run():
    """Two coefficients with a gap: scan [0]=3, [2]=-1, nC=0.
    tc=2, t1s=1 -> coeff_token '000100'; trailing sign '-'='1';
    level 3 is first non-T1 with t1s<3 -> encoded magnitude 2 ->
    levelCode=2 -> '001'; total_zeros = 2+1-2 = 1 -> tc=2 row '110';
    run_before(highest coeff, zerosLeft=1): gap between pos2 and pos0
    is 1 -> code '0'."""
    bits = encode_residual_block(_block(16, [(0, 3), (2, -1)]), 0)
    assert bits == "000100" + "1" + "001" + "110" + "0"
    got = decode_residual_block(BitCursor(bits), 0)
    assert got == _block(16, [(0, 3), (2, -1)])


def test_coeff_token_head_lengths_match_spec_matrix():
    """Independent structural anchor: the Table 9-5 head-row codeword
    LENGTHS per context, as published in the spec's length matrix.
    A transposition that preserved prefix-freeness but moved a
    codeword between rows would break these."""
    want = {
        0: {(0, 0): 1, (1, 0): 6, (1, 1): 2,
            (2, 0): 8, (2, 1): 6, (2, 2): 3},
        2: {(0, 0): 2, (1, 0): 6, (1, 1): 2,
            (2, 0): 6, (2, 1): 5, (2, 2): 3},
        4: {(0, 0): 4, (1, 0): 6, (1, 1): 4,
            (2, 0): 6, (2, 1): 5, (2, 2): 4},
    }
    for nc, lengths in want.items():
        table = coeff_token_table(nc)
        for key, ln in lengths.items():
            assert len(table[key]) == ln, (nc, key)


def test_chroma_dc_token_lengths():
    want = {(0, 0): 2, (1, 0): 6, (1, 1): 1, (2, 0): 6, (2, 1): 6,
            (2, 2): 3, (3, 0): 6, (3, 1): 7, (3, 2): 7, (3, 3): 6,
            (4, 0): 6, (4, 1): 8, (4, 2): 8, (4, 3): 7}
    assert {k: len(v) for k, v in COEFF_TOKEN_CHROMA_DC.items()} == want


# ------------------------------------------------- golden bit-vectors
#
# Round-6 verdict ask #3: the encode->decode round-trips share the
# transcribed tables, so a transposed pair of EQUAL-LENGTH codewords
# inside one table row would survive every structural check and every
# round-trip. These vectors close that hole: the bits below are
# hand-assembled from the spec's published table values and coding
# formulas (clause 9.2) — written out literally, NOT produced by the
# repo's encoder — and the decoder must reproduce the hand-derived
# coefficient lists from them. A future table transposition now fails
# here even if encoder and decoder stay mutually consistent.
#
# Derivations (scan-ordered coefficient lists; '|' marks field splits):
#   g1  nC=0 empty block: coeff_token(0,0)='1'.
#   g2  nC=0 one +1 at pos 0: token(1,1)='01' | sign '0' |
#       total_zeros tc1 val0 = '1'.
#   g3  nC=0 [5,0,-1]: token(2,1)='000100' | T1 sign '-'='1' |
#       level 5 first-coeff-adjusted to 4 -> levelCode 6 -> '0000001' |
#       total_zeros tc2 val1 = '110' | run_before zl1 run1 = '0'.
#   g4  nC=0 one +9 at pos 0 (prefix-14 escape): token(1,0)='000101' |
#       adj 8 -> levelCode 14 -> 14 zeros,'1',4-bit suffix '0000' |
#       total_zeros tc1 val0 = '1'.
#   g5  nC=0 one +17 at pos 0 (prefix-15 escape, 12-bit suffix):
#       token(1,0)='000101' | adj 16 -> levelCode 30 -> 15 zeros,'1',
#       '000000000000' | total_zeros '1'.
#   g6  nC=0 [-6,4]: token(2,0)='00000111' | level 4 adj 3 ->
#       levelCode 4 suffix_len 0 -> '00001', suffix_len adapts 0->2 |
#       level -6 -> levelCode 11, sl=2 -> prefix 2 suffix '11' ->
#       '00111' | total_zeros tc2 val0 = '111' | no zeros left.
#   g7  nC=2 one +1 at pos 0: token(1,1)='10' | '0' | tz '1'.
#   g8  nC=4 [+1,-1]: token(2,2)='1101' | signs '10' | tz tc2 val0
#       '111'.
#   g9  nC=8 FLC [3,1]: codeNum 4*(2-1)+1=5 -> '000101' | sign '0' |
#       level 3 adj 2 -> levelCode 2 -> '001' | tz '111'.
#   g10 nC=0 [0,2,0,0,0,0,0,0,1]: token(2,1)='000100' | sign '0' |
#       level 2 adj 1 -> levelCode 0 -> '1' | total_zeros tc2 val7 =
#       '0011' | run_before zl7 run6 (FLC column) = '001'.
#   g11 nC=0 [1,0,0,0,0,0,0,0,1]: token(2,2)='001' | signs '00' |
#       total_zeros tc2 val7 = '0011' | run_before zl7 run7 (unary
#       tail) = '0001'.
#   g12 chroma DC [0,0,-1,0]: token(1,1)='1' | sign '1' |
#       chroma total_zeros tc1 val2 = '001'.
#   g13 chroma DC [1,-1,1,-1] (full block, tc=4,t1s=3):
#       token(4,3)='0000000' | signs '101' | level +1 (t1s==3: no
#       adjust) -> levelCode 0 -> '1' | tc==max: no total_zeros.

_GOLDEN = [
    ("g1", 0, 16, "1", [0] * 16),
    ("g2", 0, 16, "01" "0" "1", [1] + [0] * 15),
    ("g3", 0, 16, "000100" "1" "0000001" "110" "0",
     [5, 0, -1] + [0] * 13),
    ("g4", 0, 16, "000101" + "0" * 14 + "1" + "0000" + "1",
     [9] + [0] * 15),
    ("g5", 0, 16, "000101" + "0" * 15 + "1" + "0" * 12 + "1",
     [17] + [0] * 15),
    ("g6", 0, 16, "00000111" "00001" "00111" "111",
     [-6, 4] + [0] * 14),
    ("g7", 2, 16, "10" "0" "1", [1] + [0] * 15),
    ("g8", 4, 16, "1101" "10" "111", [1, -1] + [0] * 14),
    ("g9", 8, 16, "000101" "0" "001" "111", [3, 1] + [0] * 14),
    ("g10", 0, 16, "000100" "0" "1" "0011" "001",
     [0, 2, 0, 0, 0, 0, 0, 0, 1] + [0] * 7),
    ("g11", 0, 16, "001" "00" "0011" "0001",
     [1, 0, 0, 0, 0, 0, 0, 0, 1] + [0] * 7),
    ("g12", -1, 4, "1" "1" "001", [0, 0, -1, 0]),
    ("g13", -1, 4, "0000000" "101" "1", [1, -1, 1, -1]),
]


@pytest.mark.parametrize("name,nc,mx,bits,coeffs", _GOLDEN,
                         ids=[g[0] for g in _GOLDEN])
def test_golden_bitstring_decodes(name, nc, mx, bits, coeffs):
    cur = BitCursor(bits)
    assert decode_residual_block(cur, nc, mx) == coeffs
    # the vector must consume the bitstring exactly
    assert cur.pos == len(bits)


@pytest.mark.parametrize("name,nc,mx,bits,coeffs", _GOLDEN,
                         ids=[g[0] for g in _GOLDEN])
def test_golden_bitstring_encodes(name, nc, mx, bits, coeffs):
    # the encoder picks the same (shortest legal) encoding the hand
    # derivation does, so the literal bits also pin the encode side
    assert encode_residual_block(coeffs, nc, mx) == bits
