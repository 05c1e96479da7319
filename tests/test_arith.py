"""Arithmetic coder differential tests vs the reference oracle."""
import numpy as np
import pytest

from oracle import schro_oracle as so
from schroedinger_tpu.coding import arith


def random_ops(rng, n):
    ops = []
    for _ in range(n):
        kind = rng.integers(0, 3)
        if kind == 0:
            ops.append(('b', int(rng.integers(0, arith.CTX_LAST)),
                        int(rng.integers(0, 2))))
        elif kind == 1:
            ops.append(('u', arith.CTX_ZPZN_F1, arith.CTX_COEFF_DATA,
                        int(rng.integers(0, 1000))))
        else:
            ops.append(('s', arith.CTX_NPZN_F1, arith.CTX_COEFF_DATA,
                        arith.CTX_SIGN_ZERO, int(rng.integers(-1000, 1000))))
    return ops


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
@pytest.mark.parametrize("n", [10, 500, 5000])
def test_encode_matches_oracle(seed, n):
    rng = np.random.default_rng(seed)
    ops = random_ops(rng, n)
    ref = so.arith_encode(ops)
    enc = arith.ArithEncoder()
    for op in ops:
        if op[0] == 'b':
            enc.encode_bit(op[1], op[2])
        elif op[0] == 'u':
            enc.encode_uint(op[1], op[2], op[3])
        else:
            enc.encode_sint(op[1], op[2], op[3], op[4])
    got = enc.flush()
    assert got == ref


@pytest.mark.parametrize("seed", [10, 11])
def test_roundtrip_and_decode_matches_oracle(seed):
    rng = np.random.default_rng(seed)
    ops = random_ops(rng, 2000)
    enc = arith.ArithEncoder()
    for op in ops:
        if op[0] == 'b':
            enc.encode_bit(op[1], op[2])
        elif op[0] == 'u':
            enc.encode_uint(op[1], op[2], op[3])
        else:
            enc.encode_sint(op[1], op[2], op[3], op[4])
    data = enc.flush()

    read_ops = [op[:-1] for op in ops]
    ref_vals = so.arith_decode(data, read_ops)
    dec = arith.ArithDecoder(data)
    for op, ref in zip(ops, ref_vals):
        if op[0] == 'b':
            got = dec.decode_bit(op[1])
        elif op[0] == 'u':
            got = dec.decode_uint(op[1], op[2])
        else:
            got = dec.decode_sint(op[1], op[2], op[3])
        assert got == op[-1] == ref
