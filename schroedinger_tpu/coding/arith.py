"""Dirac adaptive binary arithmetic (range) coder — bit-exact reference.

Replicates the reference coder's exact state machine (schroarith.h:146-335,
schroarith.c): 16-bit probabilities initialised to 0x8000, 256-entry
adaptation LUT, carry propagation, byte-wise renormalisation, and the
context set with uint "context chaining" via next[].

This scalar Python implementation is the conformance reference; the C++
host coder (coding/_native) is the performance path, differential-tested
against this and the oracle.  A vectorized TPU lane formulation (one lane
per subband/codeblock stream) was considered and measured to be
unnecessary: overlapped with the pipelined device compute, the host C++
coder costs 9 ms/frame at 1080p — 3.8%% of steady wall, 0.3%% exposed
(PROFILE.md).
"""
from __future__ import annotations

from typing import List

# Context indices (schroarith.h:11-84)
CTX_ZERO_CODEBLOCK = 0
CTX_QUANTISER_CONT = 1
CTX_QUANTISER_VALUE = 2
CTX_QUANTISER_SIGN = 3
CTX_ZPZN_F1 = 4
CTX_ZPNN_F1 = 5
CTX_ZP_F2 = 6
CTX_ZP_F3 = 7
CTX_ZP_F4 = 8
CTX_ZP_F5 = 9
CTX_ZP_F6p = 10
CTX_NPZN_F1 = 11
CTX_NPNN_F1 = 12
CTX_NP_F2 = 13
CTX_NP_F3 = 14
CTX_NP_F4 = 15
CTX_NP_F5 = 16
CTX_NP_F6p = 17
CTX_SIGN_POS = 18
CTX_SIGN_NEG = 19
CTX_SIGN_ZERO = 20
CTX_COEFF_DATA = 21
CTX_SB_F1 = 22
CTX_SB_F2 = 23
CTX_SB_DATA = 24
CTX_BLOCK_MODE_REF1 = 25
CTX_BLOCK_MODE_REF2 = 26
CTX_GLOBAL_BLOCK = 27
CTX_LUMA_DC_CONT_BIN1 = 28
CTX_LUMA_DC_CONT_BIN2 = 29
CTX_LUMA_DC_VALUE = 30
CTX_LUMA_DC_SIGN = 31
CTX_CHROMA1_DC_CONT_BIN1 = 32
CTX_CHROMA1_DC_CONT_BIN2 = 33
CTX_CHROMA1_DC_VALUE = 34
CTX_CHROMA1_DC_SIGN = 35
CTX_CHROMA2_DC_CONT_BIN1 = 36
CTX_CHROMA2_DC_CONT_BIN2 = 37
CTX_CHROMA2_DC_VALUE = 38
CTX_CHROMA2_DC_SIGN = 39
CTX_MV_REF1_H_CONT_BIN1 = 40
CTX_MV_REF1_H_CONT_BIN2 = 41
CTX_MV_REF1_H_CONT_BIN3 = 42
CTX_MV_REF1_H_CONT_BIN4 = 43
CTX_MV_REF1_H_CONT_BIN5 = 44
CTX_MV_REF1_H_VALUE = 45
CTX_MV_REF1_H_SIGN = 46
CTX_MV_REF1_V_CONT_BIN1 = 47
CTX_MV_REF1_V_CONT_BIN2 = 48
CTX_MV_REF1_V_CONT_BIN3 = 49
CTX_MV_REF1_V_CONT_BIN4 = 50
CTX_MV_REF1_V_CONT_BIN5 = 51
CTX_MV_REF1_V_VALUE = 52
CTX_MV_REF1_V_SIGN = 53
CTX_MV_REF2_H_CONT_BIN1 = 54
CTX_MV_REF2_H_CONT_BIN2 = 55
CTX_MV_REF2_H_CONT_BIN3 = 56
CTX_MV_REF2_H_CONT_BIN4 = 57
CTX_MV_REF2_H_CONT_BIN5 = 58
CTX_MV_REF2_H_VALUE = 59
CTX_MV_REF2_H_SIGN = 60
CTX_MV_REF2_V_CONT_BIN1 = 61
CTX_MV_REF2_V_CONT_BIN2 = 62
CTX_MV_REF2_V_CONT_BIN3 = 63
CTX_MV_REF2_V_CONT_BIN4 = 64
CTX_MV_REF2_V_CONT_BIN5 = 65
CTX_MV_REF2_V_VALUE = 66
CTX_MV_REF2_V_SIGN = 67
CTX_LAST = 68

# Context chaining for uint coding (schroarith.c:14-88 next_list)
NEXT = [0] * CTX_LAST
NEXT[CTX_QUANTISER_CONT] = CTX_QUANTISER_CONT
NEXT[CTX_ZPZN_F1] = CTX_ZP_F2
NEXT[CTX_ZPNN_F1] = CTX_ZP_F2
NEXT[CTX_ZP_F2] = CTX_ZP_F3
NEXT[CTX_ZP_F3] = CTX_ZP_F4
NEXT[CTX_ZP_F4] = CTX_ZP_F5
NEXT[CTX_ZP_F5] = CTX_ZP_F6p
NEXT[CTX_ZP_F6p] = CTX_ZP_F6p
NEXT[CTX_NPZN_F1] = CTX_NP_F2
NEXT[CTX_NPNN_F1] = CTX_NP_F2
NEXT[CTX_NP_F2] = CTX_NP_F3
NEXT[CTX_NP_F3] = CTX_NP_F4
NEXT[CTX_NP_F4] = CTX_NP_F5
NEXT[CTX_NP_F5] = CTX_NP_F6p
NEXT[CTX_NP_F6p] = CTX_NP_F6p
NEXT[CTX_SB_F1] = CTX_SB_F2
NEXT[CTX_SB_F2] = CTX_SB_F2
NEXT[CTX_LUMA_DC_CONT_BIN1] = CTX_LUMA_DC_CONT_BIN2
NEXT[CTX_LUMA_DC_CONT_BIN2] = CTX_LUMA_DC_CONT_BIN2
NEXT[CTX_CHROMA1_DC_CONT_BIN1] = CTX_CHROMA1_DC_CONT_BIN2
NEXT[CTX_CHROMA1_DC_CONT_BIN2] = CTX_CHROMA1_DC_CONT_BIN2
NEXT[CTX_CHROMA2_DC_CONT_BIN1] = CTX_CHROMA2_DC_CONT_BIN2
NEXT[CTX_CHROMA2_DC_CONT_BIN2] = CTX_CHROMA2_DC_CONT_BIN2
for _base in (CTX_MV_REF1_H_CONT_BIN1, CTX_MV_REF1_V_CONT_BIN1,
              CTX_MV_REF2_H_CONT_BIN1, CTX_MV_REF2_V_CONT_BIN1):
    NEXT[_base] = _base + 1
    NEXT[_base + 1] = _base + 2
    NEXT[_base + 2] = _base + 3
    NEXT[_base + 3] = _base + 4
    NEXT[_base + 4] = _base + 4

# Probability adaptation LUT (schroarith.c:90-122):
# window = 16 @ p0=0.5 scaling to 256 @ p=1.0
LUT = [
    0, 2, 5, 8, 11, 15, 20, 24,
    29, 35, 41, 47, 53, 60, 67, 74,
    82, 89, 97, 106, 114, 123, 132, 141,
    150, 160, 170, 180, 190, 201, 211, 222,
    233, 244, 256, 267, 279, 291, 303, 315,
    327, 340, 353, 366, 379, 392, 405, 419,
    433, 447, 461, 475, 489, 504, 518, 533,
    548, 563, 578, 593, 609, 624, 640, 656,
    672, 688, 705, 721, 738, 754, 771, 788,
    805, 822, 840, 857, 875, 892, 910, 928,
    946, 964, 983, 1001, 1020, 1038, 1057, 1076,
    1095, 1114, 1133, 1153, 1172, 1192, 1211, 1231,
    1251, 1271, 1291, 1311, 1332, 1352, 1373, 1393,
    1414, 1435, 1456, 1477, 1498, 1520, 1541, 1562,
    1584, 1606, 1628, 1649, 1671, 1694, 1716, 1738,
    1760, 1783, 1806, 1828, 1851, 1874, 1897, 1920,
    1935, 1942, 1949, 1955, 1961, 1968, 1974, 1980,
    1985, 1991, 1996, 2001, 2006, 2011, 2016, 2021,
    2025, 2029, 2033, 2037, 2040, 2044, 2047, 2050,
    2053, 2056, 2058, 2061, 2063, 2065, 2066, 2068,
    2069, 2070, 2071, 2072, 2072, 2072, 2072, 2072,
    2072, 2071, 2070, 2069, 2068, 2066, 2065, 2063,
    2060, 2058, 2055, 2052, 2049, 2045, 2042, 2038,
    2033, 2029, 2024, 2019, 2013, 2008, 2002, 1996,
    1989, 1982, 1975, 1968, 1960, 1952, 1943, 1934,
    1925, 1916, 1906, 1896, 1885, 1874, 1863, 1851,
    1839, 1827, 1814, 1800, 1786, 1772, 1757, 1742,
    1727, 1710, 1694, 1676, 1659, 1640, 1622, 1602,
    1582, 1561, 1540, 1518, 1495, 1471, 1447, 1422,
    1396, 1369, 1341, 1312, 1282, 1251, 1219, 1186,
    1151, 1114, 1077, 1037, 995, 952, 906, 857,
    805, 750, 690, 625, 553, 471, 376, 255,
]


class ArithEncoder:
    """Bit-exact encoder (schro_arith_encode_init / _schro_arith_encode_bit /
    schro_arith_flush)."""

    def __init__(self):
        self.low = 0
        self.range = 0xFFFF
        self.cntr = 0
        self.carry = 0
        self.out = bytearray()
        self.probabilities = [0x8000] * CTX_LAST

    def encode_bit(self, i: int, value: int) -> None:
        p0 = self.probabilities[i]
        rxp = (self.range * p0) >> 16
        if value:
            self.low += rxp
            self.range -= rxp
            self.probabilities[i] = p0 - LUT[p0 >> 8]
        else:
            self.range = rxp
            self.probabilities[i] = p0 + LUT[255 - (p0 >> 8)]

        while self.range <= 0x4000:
            self.low <<= 1
            self.range <<= 1
            self.cntr += 1
            if self.cntr == 8:
                if self.low < (1 << 24) and (self.low + self.range) >= (1 << 24):
                    self.carry += 1
                else:
                    if self.low >= (1 << 24):
                        self.out[-1] = (self.out[-1] + 1) & 0xFF
                        while self.carry:
                            self.out.append(0x00)
                            self.carry -= 1
                    else:
                        while self.carry:
                            self.out.append(0xFF)
                            self.carry -= 1
                    self.out.append((self.low >> 16) & 0xFF)
                self.low &= 0xFFFF
                self.cntr = 0

    def encode_uint(self, cont_ctx: int, value_ctx: int, value: int) -> None:
        value += 1
        n_bits = value.bit_length()
        for i in range(n_bits - 1):
            self.encode_bit(cont_ctx, 0)
            self.encode_bit(value_ctx, (value >> (n_bits - 2 - i)) & 1)
            cont_ctx = NEXT[cont_ctx]
        self.encode_bit(cont_ctx, 1)

    def encode_sint(self, cont_ctx: int, value_ctx: int, sign_ctx: int,
                    value: int) -> None:
        sign = 1 if value < 0 else 0
        value = -value if value < 0 else value
        self.encode_uint(cont_ctx, value_ctx, value)
        if value:
            self.encode_bit(sign_ctx, sign)

    def flush(self) -> bytes:
        """schro_arith_flush: terminate, resolve carries, trim 0xff tail."""
        extra_byte = self.cntr > 0
        for i in range(16):
            if (self.low | ((1 << (i + 1)) - 1)) > self.range - 1:
                break
        self.low |= (1 << i) - 1
        while self.cntr < 8:
            self.low = (self.low << 1) | 1
            self.cntr += 1
        if self.low >= (1 << 24):
            self.out[-1] = (self.out[-1] + 1) & 0xFF
            while self.carry:
                self.out.append(0x00)
                self.carry -= 1
        else:
            while self.carry:
                self.out.append(0xFF)
                self.carry -= 1
        self.out.append((self.low >> 16) & 0xFF)
        self.out.append((self.low >> 8) & 0xFF)
        if extra_byte:
            self.out.append(self.low & 0xFF)
        while len(self.out) > 1 and self.out[-1] == 0xFF:
            self.out.pop()
        return bytes(self.out)


class ArithDecoder:
    """Bit-exact decoder (schro_arith_decode_init / _schro_arith_decode_bit,
    the SCHRO_ARITH_DEFINE_INLINE variant used by the library)."""

    def __init__(self, data: bytes):
        self.data = data
        self.range = 0xFFFF0000
        n = len(data)
        self.code = (((data[0] if n > 0 else 0xFF) << 24)
                     | ((data[1] if n > 1 else 0xFF) << 16)
                     | ((data[2] if n > 2 else 0xFF) << 8)
                     | (data[3] if n > 3 else 0xFF)) & 0xFFFFFFFF
        self.offset = 3
        self.cntr = 16
        self.probabilities = [0x8000] * CTX_LAST

    def decode_bit(self, i: int) -> int:
        rng = self.range
        code = self.code
        while rng <= 0x40000000:
            rng = (rng << 1) & 0xFFFFFFFF
            code = (code << 1) & 0xFFFFFFFF
            self.cntr -= 1
            if self.cntr == 0:
                self.offset += 1
                code |= (self.data[self.offset] if self.offset < len(self.data)
                         else 0xFF) << 8
                self.offset += 1
                code |= (self.data[self.offset] if self.offset < len(self.data)
                         else 0xFF)
                self.cntr = 16

        p0 = self.probabilities[i]
        rxp = ((rng >> 16) * p0) & 0xFFFF0000
        value = 1 if code >= rxp else 0
        if value:
            self.probabilities[i] = p0 - LUT[p0 >> 8]
            code -= rxp
            rng -= rxp
        else:
            self.probabilities[i] = p0 + LUT[255 - (p0 >> 8)]
            rng = rxp
        self.range = rng
        self.code = code
        return value

    def decode_uint(self, cont_ctx: int, value_ctx: int) -> int:
        bits = 1
        while not self.decode_bit(cont_ctx):
            bits = (bits << 1) | self.decode_bit(value_ctx)
            cont_ctx = NEXT[cont_ctx]
        return bits - 1

    def decode_sint(self, cont_ctx: int, value_ctx: int, sign_ctx: int) -> int:
        v = self.decode_uint(cont_ctx, value_ctx)
        if v and self.decode_bit(sign_ctx):
            return -v
        return v
