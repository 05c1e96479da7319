"""Dirac intra (main-intra / simple) picture encoder.

Structure (schroencoder.c schro_encoder_encode_picture, :2463-2643, intra
path): parse info + picture header + transform parameters + per-subband
coded data (arith or no-arith). The wavelet transform runs on TPU; subband
quantisation with per-codeblock quant indices and the entropy coding run on
the host (native C++ fast path, Python reference fallback).
"""
from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from schroedinger_tpu.bitstream import (BitWriter, parse_code_picture,
                                        write_parse_info, write_picture_header,
                                        write_transform_parameters)
from schroedinger_tpu.coding import slices as sl
from schroedinger_tpu.coding import subband as sb
from schroedinger_tpu.coding.bitio import BitWriter as _BW
from schroedinger_tpu.encoder.lowdelay import _prep_plane, _forward_jit

from functools import partial
import jax


@partial(jax.jit, static_argnums=(1, 2, 3))
def _prep_plane_deep(plane_u16, out_h: int, out_w: int, bit_depth: int):
    """Deep (10/16-bit) input prep: the reference widens S16 input to its
    S32 internal frames with a PLAIN convert — no recentring; only the
    8-bit path subtracts 128 (orc_convert_s32_s16 schroorc.orc:479-487 vs
    orc_offsetconvert_s16_u8 :524-530)."""
    del bit_depth
    x = plane_u16.astype(jnp.int32)
    h, w = x.shape
    return jnp.pad(x, ((0, out_h - h), (0, out_w - w)), mode="edge")
from schroedinger_tpu.params import (Params, subband_count, subband_info,
                                     subband_position)


def _codeblock_counts(p: Params, index: int):
    position = subband_position(index)
    if index == 0:
        return p.horiz_codeblocks[0], p.vert_codeblocks[0]
    level = position >> 2
    return p.horiz_codeblocks[level + 1], p.vert_codeblocks[level + 1]


_I_CACHE = {}


def _get_i_step(p: Params, error_power: float = 4.0):
    """Fused device program pair for an 8-bit arith intra picture (the
    intra twin of inter._get_p_step — the old path paid ~30 per-band
    device fetches plus a duplicate stats transform per picture, minutes
    of tunnel latency per scene cut).

      step1(packed_u8, lam_bands) ->
          (wire, qflat_y, qflat_u, qflat_v)
        forward IWT x3, 61-way (bits, err) stat tables (band 0 estimated
        on horizontal first differences), on-device per-(component, band)
        RD argmin, quantise bands >= 1 (band 0 needs the serial decoder-
        mirrored DC-predict quantiser, schroencoder.c:3486-3668 — its RAW
        coefficients ship in the wire for the host's native loop).
        wire = stats f32 (2,61,3nb) | qi_bands i16 (3nb) |
               int8 lo (bands>=1) x3 | int8 hi (coarse bands) x3 |
               ovf u8 (3) | raw band0 i16 x3

      step2(qfy, qfu, qfv, qi_bands, dq0_y, dq0_u, dq0_v) -> recon u8 x3
        dequantises bands >= 1, splices the host's dequantised band 0,
        inverse IWT, +128, clip — the decoder-exact reconstruction for
        reference pictures, all on device.
    """
    vf = p.video_format
    depth = p.transform_depth
    wavelet = p.wavelet_filter_index
    key = ("istep",) + vf.picture_luma_size() + (depth, int(wavelet),
                                                 vf.chroma_format,
                                                 round(error_power * 16))
    hit = _I_CACHE.get(key)
    if hit is not None:
        return hit

    from schroedinger_tpu import tables
    from schroedinger_tpu.encoder.ratecontrol import _sint_bits
    from schroedinger_tpu.ops import quant as q
    from schroedinger_tpu.ops import wavelet as wv

    nb = subband_count(depth)
    iwt_dims = [(p.iwt_luma_height, p.iwt_luma_width),
                (p.iwt_chroma_height, p.iwt_chroma_width),
                (p.iwt_chroma_height, p.iwt_chroma_width)]
    pic_sizes = [vf.picture_luma_size(), vf.picture_chroma_size(),
                 vf.picture_chroma_size()]
    shapes3 = [[(oh >> depth, ow >> depth)]
               + [(oh >> (depth - (i - 1) // 3), ow >> (depth - (i - 1) // 3))
                  for i in range(1, nb)] for (oh, ow) in iwt_dims]
    sizes3 = [np.asarray([h * w for (h, w) in shapes], np.int64)
              for shapes in shapes3]
    band_id3 = [np.repeat(np.arange(nb, dtype=np.int32), sizes)
                for sizes in sizes3]
    QF = jnp.asarray(tables.QUANT_FACTOR, jnp.int32)
    QO = jnp.asarray(tables.QUANT_OFFSET_1_2, jnp.int32)  # intra offsets

    def step1(packed, lam_bands, target_bits, corr_bands):
        (wy, hy) = pic_sizes[0]
        (wc, hc) = pic_sizes[1]
        ny, nc2 = hy * wy, hc * wc
        planes = (packed[:ny].reshape(hy, wy),
                  packed[ny:ny + nc2].reshape(hc, wc),
                  packed[ny + nc2:ny + 2 * nc2].reshape(hc, wc))
        flats = []
        for plane, (oh, ow) in zip(planes, iwt_dims):
            prepped = _prep_plane(plane, oh, ow)
            pyr = _forward_jit(prepped, depth, wavelet)
            from schroedinger_tpu.coding import slices as _sl
            flat, _ = _sl.flatten_pyramid(pyr, depth)
            flats.append(flat)

        # estimate flat: band 0 as horizontal first differences (the
        # DC-predict histogram analog, schrohistogram.c:360)
        est_parts = []
        for ci, (flat, shapes) in enumerate(zip(flats, shapes3)):
            b0h, b0w = shapes[0]
            b0 = flat[:b0h * b0w].reshape(b0h, b0w)
            d0 = jnp.concatenate([b0[:, :1], b0[:, 1:] - b0[:, :-1]],
                                 axis=1).reshape(-1)
            est_parts.append(jnp.concatenate([d0, flat[b0h * b0w:]]))
        allflat = jnp.concatenate(est_parts).astype(jnp.int32)
        bounds = []
        boff = 0
        for ci, sizes in enumerate(sizes3):
            for bi, bn in enumerate(sizes):
                bounds.append((ci * nb + bi, boff, boff + int(bn)))
                boff += int(bn)

        def one(base):
            qq = q.quantise(allflat, QF[base], QO[base])
            dq = q.dequantise(qq, QF[base], QO[base])
            nzm = (qq != 0).astype(jnp.float32)
            b = (_sint_bits(qq).astype(jnp.float32) - 1.0) * nzm
            # |orig - dequant|^magic_error_power (error_pow,
            # schroquantiser.c:477-507; default 4)
            from schroedinger_tpu.encoder.ratecontrol import error_metric
            e = error_metric(
                jnp.abs((allflat - dq).astype(jnp.float32)), error_power)
            bs_ = [jnp.float32(0)] * (3 * nb)
            es = [jnp.float32(0)] * (3 * nb)
            zs = [jnp.float32(0)] * (3 * nb)
            for bi, lo, hi in bounds:
                bs_[bi] = bs_[bi] + b[lo:hi].sum()
                es[bi] = es[bi] + e[lo:hi].sum()
                zs[bi] = zs[bi] + nzm[lo:hi].sum()
            return jnp.stack(bs_), jnp.stack(es), jnp.stack(zs)

        mag, err, nz = jax.lax.map(one, jnp.arange(61, dtype=jnp.int32))
        nvec = jnp.asarray(np.concatenate(
            [s.astype(np.float64) for s in sizes3]).astype(np.float32))
        p1 = jnp.clip(nz / nvec, 1e-6, 1.0 - 1e-6)
        bits = mag - (nz * jnp.log2(p1)
                      + (nvec - nz) * jnp.log2(1.0 - p1))

        # RD pick with arith-correction-scaled bits; target_bits > 0
        # engages the on-device lambda fit to the intra allocation
        # (entropy_to_lambda bisection, schroquantiser.c:887-960)
        bits_c = corr_bands[None, :] * bits[:60]
        cols = jnp.arange(3 * nb)

        def pick_at(s_):
            cost = bits_c + (s_ * lam_bands)[None, :] * err[:60]
            qi = jnp.argmin(cost, axis=0).astype(jnp.int32)
            return qi, bits_c[qi, cols].sum()

        def fit(_):
            def body(_, lohi):
                lo, hi = lohi
                mid = jnp.sqrt(lo * hi)
                _, b2 = pick_at(mid)
                return (jnp.where(b2 < target_bits, mid, lo),
                        jnp.where(b2 < target_bits, hi, mid))

            lo, hi = jax.lax.fori_loop(
                0, 22, body,
                (jnp.float32(1.0 / 16384.0), jnp.float32(16384.0)))
            return jnp.sqrt(lo * hi)

        s_fit = jax.lax.cond(target_bits > 0, fit,
                             lambda _: jnp.float32(1.0), operand=None)
        qi_bands, _ = pick_at(s_fit)

        outq = []
        outlo = []
        outhi = []
        ovfs = []
        raw0 = []
        for ci, (flat, sizes) in enumerate(zip(flats, sizes3)):
            n0 = int(sizes[0])
            qi_c = qi_bands[ci * nb:(ci + 1) * nb]
            qf = QF[qi_c][band_id3[ci]]
            qo = QO[qi_c][band_id3[ci]]
            qq = q.quantise(flat, qf, qo).astype(jnp.int16)
            qq = qq.at[:n0].set(0)         # band 0 is host DC-predicted
            outq.append(qq)
            n_c = int(sizes[:min(4, len(sizes))].sum())
            outlo.append(qq.astype(jnp.int8))
            outhi.append((qq[:n_c] >> 8).astype(jnp.int8))
            ovfs.append(jnp.any(jnp.abs(qq[n_c:]) > 127))
            raw0.append(flat[:n0].astype(jnp.int16))

        parts = [jax.lax.bitcast_convert_type(
            jnp.stack([bits, err]), jnp.uint8).reshape(-1),
            jax.lax.bitcast_convert_type(qi_bands.astype(jnp.int16),
                                         jnp.uint8).reshape(-1)]
        parts += [jax.lax.bitcast_convert_type(a, jnp.uint8) for a in outlo]
        parts += [jax.lax.bitcast_convert_type(a, jnp.uint8) for a in outhi]
        parts.append(jnp.stack(ovfs).astype(jnp.uint8))
        parts += [jax.lax.bitcast_convert_type(a, jnp.uint8).reshape(-1)
                  for a in raw0]
        wire = jnp.concatenate(parts)
        return (wire,) + tuple(outq)

    def step2(qfy, qfu, qfv, qi_bands, dq0y, dq0u, dq0v):
        from schroedinger_tpu.coding import slices as _sl
        outs = []
        for ci, (qflat, dq0, shapes, sizes, (wpic, hpic)) in enumerate(
                zip((qfy, qfu, qfv), (dq0y, dq0u, dq0v), shapes3, sizes3,
                    pic_sizes)):
            qi_c = qi_bands[ci * nb:(ci + 1) * nb]
            qf = QF[qi_c][band_id3[ci]]
            qo = QO[qi_c][band_id3[ci]]
            dq = q.dequantise(qflat.astype(jnp.int32), qf, qo)
            n0 = int(sizes[0])
            dq = dq.at[:n0].set(dq0.astype(jnp.int32))
            bands = []
            pos = 0
            for (bh, bw) in shapes:
                bands.append(dq[pos:pos + bh * bw].reshape(bh, bw)
                             .astype(jnp.int16))
                pos += bh * bw
            rres = wv.inverse(_sl.arrays_to_pyramid(bands, depth), wavelet)
            rec = rres[:hpic, :wpic].astype(jnp.int32) + 128
            outs.append(jnp.clip(rec, 0, 255).astype(jnp.uint8))
        return tuple(outs)

    layout = {"nb": nb, "shapes3": shapes3, "sizes3": sizes3,
              "sizes_hi": [int(s[:min(4, len(s))].sum()) for s in sizes3]}
    fns = (jax.jit(step1), jax.jit(step2), layout)
    _I_CACHE[key] = fns
    return fns


def encode_picture_fused(planes_u8, p: Params, frame_number: int,
                         lam_bands, is_ref: bool = True,
                         retired: int | None = None,
                         corr=None, error_power: float = 4.0,
                         target_bits: float = 0.0):
    """Fused-path intra encode: ONE device dispatch + ONE wire fetch for
    transform/stats/pick/quantise, host native entropy + DC-predict band
    0, then one small device dispatch for the decoder-exact recon.

    lam_bands: (3nb,) per-(component, band) RD lambdas (already including
    perceptual scales); corr: optional (3nb,) arith-correction ratios —
    the device argmin uses lam/corr (same argmin as corrected bits).
    Returns (unit_bytes, recon_device_planes, qi_bands, stats,
    band_bits_actual, band_bits_est)."""
    from schroedinger_tpu.coding import slices as _sl
    nb = subband_count(p.transform_depth)
    step1, step2, lay = _get_i_step(p, error_power=error_power)
    lam = np.asarray(lam_bands, np.float64)
    cb = (np.ones(lam.size) if corr is None
          else np.maximum(np.asarray(corr, np.float64), 1e-3))
    packed = jnp.asarray(np.concatenate(
        [np.asarray(pl, np.uint8).ravel() for pl in planes_u8]))
    outs = step1(packed, jnp.asarray(lam, jnp.float32),
                 jnp.float32(target_bits or 0.0),
                 jnp.asarray(cb, jnp.float32))
    wire = np.asarray(jax.device_get(outs[0]))

    off = 0
    stats = np.frombuffer(wire, np.float32, 2 * 61 * 3 * nb, off).reshape(
        2, 61, 3 * nb)
    off += 2 * 61 * 3 * nb * 4
    qi_bands = np.frombuffer(wire, np.int16, 3 * nb, off).astype(np.int32)
    off += 3 * nb * 2
    los = []
    for sizes in lay["sizes3"]:
        n = int(sizes.sum())
        los.append(np.frombuffer(wire, np.int8, n, off))
        off += n
    his = []
    for n in lay["sizes_hi"]:
        his.append(np.frombuffer(wire, np.int8, n, off))
        off += n
    ovf = wire[off:off + 3]
    off += 3
    raw0 = []
    for sizes in lay["sizes3"]:
        n0 = int(sizes[0])
        raw0.append(np.frombuffer(wire, np.int16, n0, off).copy())
        off += 2 * n0

    host_q = []
    for c in range(3):
        if ovf[c]:
            host_q.append(np.asarray(jax.device_get(outs[1 + c])))
            continue
        lo = los[c]
        hi = his[c]
        n_c = hi.shape[0]
        qv = lo.astype(np.int16)
        qv[:n_c] = (hi.astype(np.int16) << 8) | (lo[:n_c].astype(np.int16)
                                                 & 0xFF)
        host_q.append(qv)

    # host: serial DC-predict quantise of band 0 (decoder-mirrored,
    # schroencoder.c:3486-3668) at the device-picked qi
    from schroedinger_tpu.coding import subband as _sb
    qdata0 = []
    deq0 = []
    for ci in range(3):
        b0h, b0w = lay["shapes3"][ci][0]
        hcb, vcb = _codeblock_counts(p, 0)
        qi_arr = np.full((vcb, hcb), int(qi_bands[ci * nb]), np.int32)
        qd, dq = _sb.quantise_subband(
            raw0[ci].astype(np.int64).reshape(b0h, b0w), qi_arr, 0,
            hcb, vcb, is_intra=True)
        qdata0.append(qd)
        deq0.append(dq)

    # entropy coding (native C++ per subband)
    w = BitWriter()
    code = parse_code_picture(is_ref, 0, False, False)
    write_parse_info(w, code)
    retired_delta = None
    if is_ref:
        retired_delta = 0 if retired is None else retired - frame_number
    write_picture_header(w, frame_number, retired_delta=retired_delta)
    w.sync()
    write_transform_parameters(w, p)
    w.sync()
    band_bits = np.zeros(3 * nb, np.float64)
    for comp in range(3):
        bands = _sl.unflatten_host(host_q[comp], lay["shapes3"][comp])
        bands[0] = qdata0[comp]
        for index in range(nb):
            hcb, vcb = _codeblock_counts(p, index)
            position = subband_position(index)
            qi = int(qi_bands[comp * nb + index])
            qdata = bands[index]
            w.sync()
            if not np.any(qdata):
                w.write_uint(0)
                continue
            # parent context is a zero test: quantised values suffice
            parent = bands[index - 3] if position >= 4 else None
            payload, first_qi = sb.encode_subband_arith(
                qdata, parent, position, hcb, vcb, False,
                np.full((vcb, hcb), qi, np.int32))
            band_bits[comp * nb + index] = 8 * len(payload)
            w.write_uint(len(payload))
            if first_qi == -1:
                first_qi = qi
            if len(payload) > 0:
                w.write_uint(first_qi)
                w.sync()
                w.write_bytes(bytes(payload))
    w.sync()
    unit = w.get_bytes()

    recon = step2(outs[1], outs[2], outs[3], jnp.asarray(qi_bands),
                  jnp.asarray(np.asarray(deq0[0], np.int16).ravel()),
                  jnp.asarray(np.asarray(deq0[1], np.int16).ravel()),
                  jnp.asarray(np.asarray(deq0[2], np.int16).ravel()))
    est = stats[0][np.clip(qi_bands, 0, 60), np.arange(3 * nb)]
    return unit, recon, qi_bands, (stats[0].copy(), stats[1].copy()), \
        band_bits, est


def encode_picture(planes_u8, p: Params, frame_number: int,
                   quant_indices=None, is_ref: bool = False,
                   retired: int | None = None,
                   return_recon: bool = False,
                   band_bits_out: list | None = None):
    """Encode one intra picture; quant_indices: either None (all zero:
    lossless), an int, or a map (component, subband) -> (vcb, hcb) array.

    band_bits_out: optional list; when given, a (3*nb,) per-(component,
    band) coded-payload-bits array is appended (actual_subband_bits
    analog, schroencoder.c:2548-2568, for the arith-correction EMA)."""
    depth = p.transform_depth
    nb = subband_count(depth)
    iwt_dims = [(p.iwt_luma_height, p.iwt_luma_width),
                (p.iwt_chroma_height, p.iwt_chroma_width),
                (p.iwt_chroma_height, p.iwt_chroma_width)]

    w = BitWriter()
    code = parse_code_picture(is_ref, 0, False, p.is_noarith)
    write_parse_info(w, code)
    retired_delta = None
    if is_ref:
        retired_delta = 0 if retired is None else retired - frame_number
    write_picture_header(w, frame_number, retired_delta=retired_delta)
    w.sync()
    write_transform_parameters(w, p)
    w.sync()

    bit_depth = p.video_format.bit_depth
    band_bits = np.zeros(3 * nb, np.float64)
    recon_planes = []
    for comp, (plane, (oh, ow)) in enumerate(zip(planes_u8, iwt_dims)):
        if bit_depth > 8:
            prepped = _prep_plane_deep(jnp.asarray(plane), oh, ow, bit_depth)
        else:
            prepped = _prep_plane(jnp.asarray(plane), oh, ow)
        pyr = _forward_jit(prepped, depth, p.wavelet_filter_index)
        bands = [np.asarray(b, dtype=np.int64)
                 for b in sl.subband_arrays(pyr, depth)]

        deq_bands = [None] * nb
        for index in range(nb):
            hcb, vcb = _codeblock_counts(p, index)
            position = subband_position(index)
            if quant_indices is None:
                qi_arr = np.zeros((vcb, hcb), dtype=np.int32)
            elif np.isscalar(quant_indices):
                qi_arr = np.full((vcb, hcb), int(quant_indices), np.int32)
            else:
                qi_arr = np.asarray(quant_indices[(comp, index)], np.int32)

            qdata, deq = sb.quantise_subband(
                bands[index], qi_arr, position, hcb, vcb,
                is_intra=(p.num_refs == 0), deep=bit_depth > 8)
            deq_bands[index] = deq

            w.sync()
            if not np.any(qdata):
                w.write_uint(0)
                continue

            parent_deq = deq_bands[index - 3] if position >= 4 else None
            have_qo = p.codeblock_mode_index == 1
            if p.is_noarith:
                from schroedinger_tpu.coding import native as _nat
                payload = _nat.encode_subband_noarith(
                    qdata, position, hcb, vcb, have_qo)
                first_qi = int(qi_arr[0, 0])
            else:
                payload, first_qi = sb.encode_subband_arith(
                    qdata, parent_deq, position, hcb, vcb, have_qo, qi_arr)
            band_bits[comp * nb + index] = 8 * len(payload)
            w.write_uint(len(payload))
            if first_qi == -1:
                first_qi = int(qi_arr[0, 0])
            if len(payload) > 0:
                w.write_uint(first_qi)
                w.sync()
                w.write_bytes(bytes(payload))
        if return_recon:
            from schroedinger_tpu.coding import slices as _sl
            from schroedinger_tpu.decoder.lowdelay import _inverse_jit, _to_u8
            from schroedinger_tpu.decoder.intra import _to_deep
            dt = np.int32 if bit_depth > 8 else np.int16
            rpyr = _sl.arrays_to_pyramid(
                [jnp.asarray(np.asarray(b, dtype=dt)) for b in deq_bands],
                depth)
            rplane = _inverse_jit(rpyr, p.wavelet_filter_index)
            sizes = [p.video_format.picture_luma_size(),
                     p.video_format.picture_chroma_size(),
                     p.video_format.picture_chroma_size()]
            (w_pic, h_pic) = sizes[comp]
            if bit_depth > 8:
                recon_planes.append(np.asarray(
                    _to_deep(rplane, h_pic, w_pic, bit_depth)))
            else:
                recon_planes.append(np.asarray(_to_u8(rplane, h_pic, w_pic)))
    w.sync()
    if band_bits_out is not None:
        band_bits_out.append(band_bits)
    if return_recon:
        return w.get_bytes(), tuple(recon_planes)
    return w.get_bytes()
