"""CAVLC residual entropy coding (ITU-T Rec. H.264 clause 9.2) — the
sparse-residual subset, from the public specification.

Round-5 verdict #8 asked for the same sourcing protocol as the MP3
dead-end note: search the retrieved public content for the normative
clause-9.2 tables, implement what is reproducible, document what is
not. The retrieved channel (PAPERS.md / SNIPPETS.md) carries zero
H.264 material, so the split is by what the spec defines by FORMULA
versus by raw TABLE:

Implemented (formula-defined in the spec text, no tabulated data):
  - level decoding/encoding (9.2.2.1): unary level_prefix, the
    adaptive suffixLength state machine, the level_prefix==14 4-bit
    and >=15 escape ladders, the +2 levelCode bump after fewer than
    three trailing ones;
  - trailing-one signs, zerosLeft bookkeeping, the coefficient/run
    reassembly loop (9.2.3/9.2.4);
  - the nC>=8 coeff_token 6-bit fixed-length code
    (codeNum = 4*(TotalCoeff-1)+TrailingOnes, TotalCoeff=0 -> 3);
  - run_before column zerosLeft>6 (3-bit FLC + unary tail 7..14).

Implemented (tabulated, transcribed here ONLY for the rows that are
reproduced verbatim across public teaching material and validated
structurally below):
  - coeff_token for TotalCoeff<=2, all three nC VLC contexts, plus the
    chroma-DC (nC==-1) context for TotalCoeff<=4 (its full range);
  - total_zeros for TotalCoeff in {1,2} (Table 9-7 head rows) and the
    complete 2x2 chroma-DC total_zeros table (Table 9-9(a));
  - run_before (Table 9-10, complete: columns zerosLeft 1..6 are
    tabulated, zerosLeft>6 is the formula column above).

NOT implemented — documented boundary, the same class as the MP3
synthesis window (functions/mpeg_audio.py:18-31): the deep rows of
Table 9-5 (TotalCoeff 3..16) and Tables 9-7/9-8 (total_zeros for
TotalCoeff 3..15) are normative tabulated data whose tail codewords
are not reproducible from the spec's prose and are absent from the
retrieved content (re-searched round 7: case-insensitive grep over
PAPERS.md / SNIPPETS.md for 9-5 / cavlc / coeff_token / total_zeros /
h264 / h.264 / avc — zero hits; transcribing the ~200 deep codewords
from unaided memory would recreate exactly the same-length-
transposition risk this module's golden vectors exist to kill, with
no conformant third-party bitstream available to validate against).
Decoding a block that uses them raises NotImplementedError at the
exact bit position. This is a REAL decoder
for a real, conformant stream class: an encoder may legally quantize
every 4x4 block to at most two nonzero coefficients (low-bitrate
operating point), and with all blocks <=2 coefficients the nC
neighbour average round((nA+nB)/2) never exceeds 2, so such streams
never touch the missing rows. h264_islice.py builds exactly those
streams; any conformant third-party decoder plays them.

Structural validation (tests/test_h264_cavlc.py): every transcribed
VLC context is checked prefix-free, the complete tables are checked
Kraft-complete (sum 2^-len == 1), and encode->decode round-trips are
exhaustive over the subset's coefficient space. The one error class
those checks cannot catch — a transposed pair of equal-length
codewords inside one table row, invisible to round-trips because
encoder and decoder share the tables — is closed by the hand-derived
golden bit-vectors in the same file (round-6 verdict #3): literal
bitstrings assembled from the published table values, decoded against
hand-derived coefficient lists, covering every context's head rows,
both escape ladders, both run_before columns, and the chroma-DC
tables.
"""

from __future__ import annotations

from functools import lru_cache

# --------------------------------------------------------------------------
# Table 9-5 (coeff_token), head rows (TotalCoeff <= 2), per nC context.
# Key: (TotalCoeff, TrailingOnes) -> bitstring.
# --------------------------------------------------------------------------

COEFF_TOKEN_NC0 = {   # 0 <= nC < 2
    (0, 0): "1",
    (1, 0): "000101", (1, 1): "01",
    (2, 0): "00000111", (2, 1): "000100", (2, 2): "001",
}

COEFF_TOKEN_NC2 = {   # 2 <= nC < 4
    (0, 0): "11",
    (1, 0): "001011", (1, 1): "10",
    (2, 0): "000111", (2, 1): "00111", (2, 2): "011",
}

COEFF_TOKEN_NC4 = {   # 4 <= nC < 8
    (0, 0): "1111",
    (1, 0): "001111", (1, 1): "1110",
    (2, 0): "001011", (2, 1): "01111", (2, 2): "1101",
}

# chroma DC (nC == -1): TotalCoeff <= 4 is the COMPLETE table
COEFF_TOKEN_CHROMA_DC = {
    (0, 0): "01",
    (1, 0): "000111", (1, 1): "1",
    (2, 0): "000100", (2, 1): "000110", (2, 2): "001",
    (3, 0): "000011", (3, 1): "0000011", (3, 2): "0000010", (3, 3): "000101",
    (4, 0): "000010", (4, 1): "00000011", (4, 2): "00000010", (4, 3): "0000000",
}

# --------------------------------------------------------------------------
# total_zeros, 4x4 blocks (Table 9-7 head rows: TotalCoeff 1 and 2).
# Row key: TotalCoeff; inner: total_zeros value -> bitstring.
# --------------------------------------------------------------------------

TOTAL_ZEROS_4x4 = {
    1: ["1", "011", "010", "0011", "0010", "00011", "00010", "000011",
        "000010", "0000011", "0000010", "00000011", "00000010",
        "000000011", "000000010", "000000001"],
    2: ["111", "110", "101", "100", "011", "0101", "0100", "0011",
        "0010", "00011", "00010", "000011", "000010", "000001",
        "000000"],
}

# 2x2 chroma DC total_zeros (Table 9-9(a), complete)
TOTAL_ZEROS_CHROMA_DC = {
    1: ["1", "01", "001", "000"],
    2: ["1", "01", "00"],
    3: ["1", "0"],
}

# --------------------------------------------------------------------------
# run_before (Table 9-10). Columns zerosLeft 1..6 tabulated; zerosLeft
# > 6 handled by formula in _run_before_codes.
# --------------------------------------------------------------------------

RUN_BEFORE = {
    1: ["1", "0"],
    2: ["1", "01", "00"],
    3: ["11", "10", "01", "00"],
    4: ["11", "10", "01", "001", "000"],
    5: ["11", "10", "011", "010", "001", "000"],
    6: ["11", "000", "001", "011", "010", "101", "100"],
}


@lru_cache(maxsize=None)
def _run_before_codes(zeros_left: int) -> list[str]:
    """Codeword list (index = run_before) for a zerosLeft column.
    zerosLeft > 6: 3-bit FLC for runs 0..6 (111 down to 001), then the
    unary ladder 0001, 00001, ... for runs 7..14."""
    if zeros_left <= 6:
        return RUN_BEFORE[zeros_left]
    codes = [format(7 - r, "03b") for r in range(7)]
    codes += ["0" * (r - 4) + "1" for r in range(7, 15)]
    return codes


@lru_cache(maxsize=None)
def coeff_token_table(nc: int) -> dict:
    """The (TotalCoeff, TrailingOnes) -> bits map for an nC context.
    nC >= 8 is the 6-bit FLC built by formula. Cached so _read_vlc's
    id-keyed reverse-map memo sees one stable object per context
    (callers treat the returned dict as read-only)."""
    if nc == -1:
        return COEFF_TOKEN_CHROMA_DC
    if nc < 2:
        return COEFF_TOKEN_NC0
    if nc < 4:
        return COEFF_TOKEN_NC2
    if nc < 8:
        return COEFF_TOKEN_NC4
    flc = {(0, 0): format(3, "06b")}
    for tc in range(1, 17):
        for t1 in range(min(tc, 3) + 1):
            flc[(tc, t1)] = format(4 * (tc - 1) + t1, "06b")
    return flc


_MAX_SUBSET_COEFFS = 2  # the sparse-residual profile bound


class CavlcBoundary(NotImplementedError):
    """A conformant stream stepped outside the sparse-residual subset
    (deep Table 9-5 / 9-7 / 9-8 rows — see module docstring)."""


# --------------------------------------------------------------------------
# bit cursor helpers (the h264 module's reader works on whole RBSPs;
# residual parsing needs a plain bit cursor over an already-extracted
# bit list, so these mirror its contract without importing Spark)
# --------------------------------------------------------------------------


class BitCursor:
    def __init__(self, bits: str):
        self.bits = bits
        self.pos = 0

    def take(self, n: int) -> str:
        if self.pos + n > len(self.bits):
            raise ValueError("CAVLC: bitstream exhausted")
        out = self.bits[self.pos:self.pos + n]
        self.pos += n
        return out

    def take_int(self, n: int) -> int:
        return int(self.take(n), 2) if n else 0

    def unary_zeros(self) -> int:
        """Count zeros up to the terminating 1 (consumed)."""
        n = 0
        while self.take(1) == "0":
            n += 1
            if n > 64:
                raise ValueError("CAVLC: runaway unary code")
        return n


# reverse {bits: key} maps memoized per table object. Keyed by id():
# every table reaching _read_vlc is either a module-level constant or
# an lru_cache-stable return of coeff_token_table/_run_before_codes,
# and the cache value holds the table itself so its id can't be
# recycled. Rebuilding this map per decoded codeword dominated the
# pandas-UDF parity legs (one ~60-entry dict per coefficient token).
_VLC_REVERSE: dict[int, tuple[object, dict, int]] = {}


def _read_vlc(cur: BitCursor, table: dict | list) -> object:
    """Prefix-decode one codeword from a {key: bits} dict or a list
    (index = value)."""
    hit = _VLC_REVERSE.get(id(table))
    if hit is None:
        items = (
            list(enumerate(table)) if isinstance(table, list)
            else [(k, v) for k, v in table.items()]
        )
        by_bits = {bits: key for key, bits in items}
        max_len = max(len(b) for b in by_bits)
        _VLC_REVERSE[id(table)] = (table, by_bits, max_len)
    else:
        _, by_bits, max_len = hit
    acc = ""
    while len(acc) <= max_len:
        acc += cur.take(1)
        if acc in by_bits:
            return by_bits[acc]
    raise ValueError(f"CAVLC: no codeword matches {acc!r}")


# --------------------------------------------------------------------------
# level coding (9.2.2.1) — fully formula-defined
# --------------------------------------------------------------------------


def _decode_level(cur: BitCursor, suffix_length: int) -> int:
    prefix = cur.unary_zeros()
    if suffix_length == 0:
        if prefix < 14:
            level_code = prefix
        elif prefix == 14:
            level_code = 14 + cur.take_int(4)
        else:  # prefix >= 15: escape
            level_code = 15 + cur.take_int(prefix - 3) + 15
            if prefix >= 16:
                level_code += (1 << (prefix - 3)) - 4096
    else:
        if prefix < 15:
            level_code = (prefix << suffix_length) + cur.take_int(suffix_length)
        else:
            level_code = (15 << suffix_length) + cur.take_int(prefix - 3)
            if prefix >= 16:
                level_code += (1 << (prefix - 3)) - 4096
    if level_code % 2 == 0:
        return (level_code + 2) >> 1
    return -((level_code + 1) >> 1)


def _escape_base(prefix: int, suffix_length: int) -> int:
    """levelCode represented by escape prefix `prefix` with an all-zero
    suffix — the decode-side constant folded out of _decode_level."""
    base = 30 if suffix_length == 0 else (15 << suffix_length)
    if prefix >= 16:
        base += (1 << (prefix - 3)) - 4096
    return base


def _encode_level(level: int, suffix_length: int) -> str:
    """Inverse of _decode_level, choosing the shortest legal encoding."""
    assert level != 0, "zero is not a codable level"
    level_code = 2 * level - 2 if level > 0 else -2 * level - 1
    if suffix_length == 0:
        if level_code < 14:
            return "0" * level_code + "1"
        if level_code < 30:
            return "0" * 14 + "1" + format(level_code - 14, "04b")
    else:
        if level_code < (15 << suffix_length):
            prefix = level_code >> suffix_length
            return ("0" * prefix + "1"
                    + format(level_code & ((1 << suffix_length) - 1),
                             f"0{suffix_length}b"))
    # escape ladder (prefix >= 15): smallest prefix whose suffix field
    # holds level_code - base(prefix)
    for prefix in range(15, 33):
        rem = level_code - _escape_base(prefix, suffix_length)
        if 0 <= rem < (1 << (prefix - 3)):
            return "0" * prefix + "1" + format(rem, f"0{prefix - 3}b")
    raise ValueError("level magnitude out of range")


def _next_suffix_length(suffix_length: int, level: int) -> int:
    if suffix_length == 0:
        suffix_length = 1
    if abs(level) > (3 << (suffix_length - 1)) and suffix_length < 6:
        suffix_length += 1
    return suffix_length


# --------------------------------------------------------------------------
# block codec (9.2): coefficients in decoding order = reverse scan
# order, highest-frequency first
# --------------------------------------------------------------------------


def encode_residual_block(coeffs: list[int], nc: int,
                          max_coeffs: int = 16) -> str:
    """Encode one residual block's scan-ordered coefficient list (length
    max_coeffs: 16 for a 4x4, 15 for Intra16x16 AC, 4 for chroma DC)
    as a CAVLC bitstring. The sparse-residual profile allows at most
    two nonzero coefficients per block (except chroma DC, whose
    coeff_token table is complete)."""
    if len(coeffs) != max_coeffs:
        raise ValueError(f"expected {max_coeffs} coefficients")
    nz = [(i, c) for i, c in enumerate(coeffs) if c != 0]
    total_coeff = len(nz)
    limit = 4 if nc == -1 else _MAX_SUBSET_COEFFS
    if total_coeff > limit:
        raise CavlcBoundary(
            f"{total_coeff} nonzero coefficients: Table 9-5/9-7 rows for "
            f"TotalCoeff>{limit} are outside the sparse-residual subset"
        )

    # trailing ones: up to three |1| coefficients at the high-frequency
    # end of the nonzero list
    t1s = 0
    while (t1s < min(3, total_coeff)
           and abs(nz[total_coeff - 1 - t1s][1]) == 1):
        t1s += 1

    out = coeff_token_table(nc)[(total_coeff, t1s)]
    if total_coeff == 0:
        return out

    # trailing-one signs, high frequency first
    for k in range(t1s):
        out += "1" if nz[total_coeff - 1 - k][1] < 0 else "0"

    # remaining levels, high frequency first
    suffix_length = 1 if total_coeff > 10 and t1s < 3 else 0
    first = True
    for k in range(total_coeff - 1 - t1s, -1, -1):
        level = nz[k][1]
        enc_level = level
        if first and t1s < 3:
            # levelCode += 2 on the decode side; mirror by shifting the
            # magnitude down one before encoding
            enc_level = level - 1 if level > 0 else level + 1
        first = False
        out += _encode_level(enc_level, suffix_length)
        # mirror the decoder: the suffixLength update uses the FINAL
        # level value, not the shifted-down encoded magnitude
        suffix_length = _next_suffix_length(suffix_length, level)

    if total_coeff < max_coeffs:
        total_zeros = nz[-1][0] + 1 - total_coeff
        if nc == -1:
            out += TOTAL_ZEROS_CHROMA_DC[total_coeff][total_zeros]
        else:
            if total_coeff not in TOTAL_ZEROS_4x4:
                raise CavlcBoundary(
                    f"total_zeros table row {total_coeff} outside subset"
                )
            out += TOTAL_ZEROS_4x4[total_coeff][total_zeros]
        zeros_left = total_zeros
        for k in range(total_coeff - 1, 0, -1):
            run_before = nz[k][0] - nz[k - 1][0] - 1
            if zeros_left > 0:
                out += _run_before_codes(zeros_left)[run_before]
                zeros_left -= run_before
            elif run_before:
                raise AssertionError("run with no zeros left")
    return out


def decode_residual_block(cur: BitCursor, nc: int,
                          max_coeffs: int = 16) -> list[int]:
    """Decode one CAVLC residual block into its scan-ordered coefficient
    list (inverse of encode_residual_block)."""
    total_coeff, t1s = _read_vlc(cur, coeff_token_table(nc))
    limit = 4 if nc == -1 else _MAX_SUBSET_COEFFS
    if total_coeff > limit:
        raise CavlcBoundary(
            f"coeff_token TotalCoeff={total_coeff} outside the "
            f"sparse-residual subset"
        )
    coeffs = [0] * max_coeffs
    if total_coeff == 0:
        return coeffs

    levels = [0] * total_coeff
    for k in range(t1s):
        levels[total_coeff - 1 - k] = -1 if cur.take(1) == "1" else 1
    suffix_length = 1 if total_coeff > 10 and t1s < 3 else 0
    first = True
    for k in range(total_coeff - 1 - t1s, -1, -1):
        level = _decode_level(cur, suffix_length)
        if first and t1s < 3:
            level = level + 1 if level > 0 else level - 1
        first = False
        levels[k] = level
        # spec 9.2.2.2: the update uses the FINAL levelVal, i.e. after
        # the first-coefficient +-1 adjustment above
        suffix_length = _next_suffix_length(suffix_length, level)

    if total_coeff < max_coeffs:
        if nc == -1:
            total_zeros = _read_vlc(cur, TOTAL_ZEROS_CHROMA_DC[total_coeff])
        else:
            total_zeros = _read_vlc(cur, TOTAL_ZEROS_4x4[total_coeff])
    else:
        total_zeros = 0

    # place coefficients: decode runs high-frequency-first
    zeros_left = total_zeros
    pos = total_coeff + total_zeros - 1
    for k in range(total_coeff - 1, -1, -1):
        coeffs[pos] = levels[k]
        if k > 0:
            if zeros_left > 0:
                run_before = _read_vlc(cur, _run_before_codes(zeros_left))
                zeros_left -= run_before
            else:
                run_before = 0
            pos -= 1 + run_before
    return coeffs
