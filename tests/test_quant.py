"""Quantiser differential tests vs the reference oracle."""
import numpy as np
import pytest

from oracle import schro_oracle as so
from schroedinger_tpu import tables
from schroedinger_tpu.ops import quant


@pytest.mark.parametrize("qi", [0, 1, 7, 16, 31, 45, 60])
@pytest.mark.parametrize("intra", [True, False])
def test_quantise_matches_oracle(qi, intra):
    qf = int(tables.QUANT_FACTOR[qi])
    qo = int((tables.QUANT_OFFSET_1_2 if intra else tables.QUANT_OFFSET_3_8)[qi])
    vals = np.concatenate([
        np.arange(-300, 300),
        np.array([-32768, -32767, 32767, -10000, 10000, -1, 0, 1]),
        np.random.default_rng(qi).integers(-30000, 30000, 200),
    ]).astype(np.int32)
    got_q = np.asarray(quant.quantise(vals, qf, qo))
    got_dq = np.asarray(quant.dequantise(got_q, qf, qo))
    for v, gq, gdq in zip(vals.tolist(), got_q.tolist(), got_dq.tolist()):
        rq = so.quantise(v, qf, qo)
        assert gq == rq, f"quantise({v}, {qf}, {qo}): {gq} != {rq}"
        rdq = so.dequantise(rq, qf, qo)
        assert gdq == rdq, f"dequantise({rq}): {gdq} != {rdq}"


def test_quant_factor_formula():
    # QF(i) = round(2^(i/4) * 4) — sanity-check the table against the formula
    for i in range(61):
        expect = round(2 ** (i / 4.0) * 4)
        assert abs(int(tables.QUANT_FACTOR[i]) - expect) <= 1
