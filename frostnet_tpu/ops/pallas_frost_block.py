"""Pallas TPU kernel: one fused INT8 CascadePreEx (Frost) block.

The frozen-INT8 Frost block (models/frostnet.py CascadePreExBottleneck,
reference frostnet.py:81-145) is a chain of five observed ops

    squeeze 1x1 -> QCat -> expand 1x1 -> depthwise kxk -> reduce 1x1 [-> QAdd]

that the XLA path executes as ~10 kernels, each round-tripping its u8
activations through HBM and paying per-op dispatch. This kernel runs the
whole block in VMEM: the expanded tensor (the block's largest activation,
e.g. 14x14x816 u8) never touches HBM.

Numerics are BIT-IDENTICAL to the unfused path (nn/conv.py INT8 branch +
nn/quant_ops.py QCat/QAdd + quant/fake_quant.quantize):

  * 1x1 convs: s8 x s8 -> s32 MXU dots on (q - 128), with the zero-point
    correction applied in int32 as ``acc + (128 - zp) * sum(w)`` — exactly
    the padded-conv formulation of nn/conv.py:194-207.
  * the QCat is folded away algebraically: dot(cat(a, b), W) =
    dot(a, W[:Ca]) + dot(b, W[Ca:]) in exact int32; each part is first
    requantized to the cat observer's grid, reproducing QCat's
    dequant->requant double rounding.
  * depthwise conv: k^2 shifted VPU multiply-adds in int32 over a
    zero-point-padded tile (qnnpack pad semantics).
  * every requant is ``clip(round(y / s) + zp, 0, 255)`` with f32 division
    and round-half-even, the quantize() formula.

Intermediate "u8" activations are carried as f32 grid values in
registers/VMEM (Mosaic has no f32->u8 cast; only the final store hops
through i32). Weight scales are per-channel vectors so both QNNPACK
(per-tensor) and FBGEMM (per-channel) qconfigs work.

Measured results (v5e, scripts/probe_frost_block.py + bench_int8_serving.py
--modes int8,fused --check): bit-exact on all four block variants on the
real chip, standalone-block speed 0.95-1.07x the unfused XLA chain, but
whole-model (frostnet_large_1_0, bs128/224) the fused path is ~2.8x SLOWER
(8.7k vs 24.3k img/s). The block is VPU-bound (k^2 depthwise taps and the
requant chains run on the VPU; the MXU dots are a small fraction), so
fusing away the HBM round trips buys little, while the kernel gives up
XLA's cross-block pipelining and its freedom to pick per-layer layouts.
``FrostNet(fuse_int8=True)`` therefore stays OFF by default: the kernel is
a verified-correct fusion demonstration, not a production win.

Kernel playbook: /opt/skills/guides/pallas_guide.md.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# indices into the scalar arrays (f32 scales / i32 zero points)
_IX, _ISQ, _ICAT, _IE, _ID, _IR, _IADD = range(7)


@dataclasses.dataclass(frozen=True)
class FrostBlockSpec:
    """Static shape/variant config of one fused block."""

    h: int
    w: int
    cin: int
    cout: int
    kernel: int            # depthwise kernel size (3 or 5)
    stride: int            # 1 or 2
    has_squeeze: bool      # CAS variant (squeeze + cat)
    has_expand: bool       # expand_ratio > 1
    c_sq: int              # squeeze channels (0 when not has_squeeze)
    c_e: int               # depthwise width (expanded channels)
    residual: bool
    act_qmax: int = 255    # activation grid max: 255 qnnpack, 127 fbgemm
                           # (reduce_range) — quant/qtypes.py

    @property
    def pad(self) -> int:
        return (self.kernel - 1) // 2

    @property
    def out_hw(self) -> Tuple[int, int]:
        k, s, p = self.kernel, self.stride, self.pad
        return ((self.h + 2 * p - k) // s + 1, (self.w + 2 * p - k) // s + 1)


def _requant(q, s_in, z_in, s_out, z_out, qmax):
    """u8-grid -> u8-grid requant (QCat/QAdd input semantics), f32 carrier."""
    y = (q - z_in) * s_in
    return jnp.clip(jnp.round(y / s_out) + z_out, 0.0, qmax)


def _to_s8(q_f32):
    # grid value in [0,255] -> int8 (q - 128); f32->i32 exact for <=2^24
    return (q_f32.astype(jnp.int32) - 128).astype(jnp.int8)


def _dot_s8(x8, w_ref):
    return jax.lax.dot_general(
        x8, w_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )


def _epilogue(acc, z_in_i32, wsum_ref, scale_ref, bias_ref, s_out, z_out, relu,
              qmax):
    """int32 accumulator -> u8-grid f32 value (conv requant epilogue)."""
    acc = acc + (128 - z_in_i32) * wsum_ref[:]
    y = acc.astype(jnp.float32) * scale_ref[:] + bias_ref[:]
    if relu:
        y = jnp.maximum(y, 0.0)
    return jnp.clip(jnp.round(y / s_out) + z_out, 0.0, qmax)


def _make_kernel(spec: FrostBlockSpec, bt: int):
    k, st, p = spec.kernel, spec.stride, spec.pad
    ho, wo = spec.out_hw

    def kernel(sf_ref, zi_ref,               # SMEM scalar rows (1, 7)
               x_ref,                        # (bt, H, W, Cin) u8
               sq_w, sq_ws, sq_sc, sq_b,     # squeeze (or placeholders)
               ex_wa, ex_wb, ex_ws, ex_sc, ex_b,   # expand
               dw_w, dw_sc, dw_b,            # depthwise (k*k, E) i32 path
               rd_w, rd_ws, rd_sc, rd_b,     # reduce
               out_ref):
        sf = [sf_ref[0, i] for i in range(7)]
        zi = [zi_ref[0, i] for i in range(7)]
        z_x = zi[_IX]
        qmax = float(spec.act_qmax)
        m = bt * spec.h * spec.w

        # u8 grid, f32 carrier (Mosaic has no u8->f32 cast; hop through i32)
        qx = x_ref[:].astype(jnp.int32).astype(jnp.float32)
        qx2 = qx.reshape(m, spec.cin)

        # ---- squeeze + (folded) cat + expand -> (m, E) u8-grid -------------
        if spec.has_expand:
            if spec.has_squeeze:
                acc_s = _dot_s8(_to_s8(qx2), sq_w)
                q_s = _epilogue(acc_s, z_x, sq_ws, sq_sc, sq_b,
                                sf[_ISQ], zi[_ISQ].astype(jnp.float32), True,
                                qmax)
                # both cat halves requant to the cat observer's grid
                q_ca = _requant(q_s, sf[_ISQ], zi[_ISQ].astype(jnp.float32),
                                sf[_ICAT], zi[_ICAT].astype(jnp.float32), qmax)
                q_cb = _requant(qx2, sf[_IX], z_x.astype(jnp.float32),
                                sf[_ICAT], zi[_ICAT].astype(jnp.float32), qmax)
                acc_e = _dot_s8(_to_s8(q_ca), ex_wa) + _dot_s8(_to_s8(q_cb), ex_wb)
                z_in_e = zi[_ICAT]
            else:
                acc_e = _dot_s8(_to_s8(qx2), ex_wa)
                z_in_e = z_x
            q_e = _epilogue(acc_e, z_in_e, ex_ws, ex_sc, ex_b,
                            sf[_IE], zi[_IE].astype(jnp.float32), True, qmax)
            z_dwin = zi[_IE]
            s_dwin_idx = _IE
        else:
            q_e = qx2
            z_dwin = z_x
            s_dwin_idx = _IX

        # ---- depthwise k x k (VPU) ------------------------------------------
        # All arithmetic in f32: |tap| <= 255, |w| <= 127, k^2 <= 25 taps, so
        # the accumulator is bounded by 25*255*127 < 2^23 — every intermediate
        # is an exact integer in f32, and the VPU has native f32 FMA while
        # int32 multiplies are emulated.
        q_e4 = q_e.reshape(bt, spec.h, spec.w, spec.c_e)
        zf = z_dwin.astype(jnp.float32)
        xi = jnp.pad(q_e4 - zf, ((0, 0), (p, p), (p, p), (0, 0)))
        wf = dw_w[:].astype(jnp.float32)             # (k*k, E)
        if st == 1:
            taps = [xi[:, dy:dy + ho, dx:dx + wo, :]
                    for dy in range(k) for dx in range(k)]
        else:
            # strided slices lower to unsupported gathers; build the 2x2
            # parity-subsampled grids with slice+reshape, then every tap is
            # a plain slice of one of them.
            hp, wp = spec.h + 2 * p, spec.w + 2 * p

            def sub_h(a, par):
                n = (hp - par) // 2
                a = a[:, par:par + 2 * n, :, :]
                a = a.reshape(bt, n, 2, a.shape[2], spec.c_e)[:, :, 0:1]
                return a.reshape(bt, n, -1, spec.c_e)

            def sub_w(a, par):
                n = (wp - par) // 2
                a = a[:, :, par:par + 2 * n, :]
                a = a.reshape(bt, a.shape[1], n, 2, spec.c_e)[:, :, :, 0:1, :]
                return a.reshape(bt, a.shape[1], n, spec.c_e)

            grids = {(py, px): sub_w(sub_h(xi, py), px)
                     for py in (0, 1) for px in (0, 1)}
            taps = [grids[(dy % 2, dx % 2)][:, dy // 2:dy // 2 + ho,
                                            dx // 2:dx // 2 + wo, :]
                    for dy in range(k) for dx in range(k)]
        acc_d = jnp.zeros((bt, ho, wo, spec.c_e), jnp.float32)
        for t, tap in enumerate(taps):
            acc_d = acc_d + tap * wf[t:t + 1, :].reshape(1, 1, 1, spec.c_e)
        y_d = acc_d * dw_sc[:] + dw_b[:]
        y_d = jnp.maximum(y_d, 0.0)
        q_d = jnp.clip(jnp.round(y_d / sf[_ID]) + zi[_ID].astype(jnp.float32),
                       0.0, qmax)

        # ---- reduce 1x1 -----------------------------------------------------
        mo = bt * ho * wo
        acc_r = _dot_s8(_to_s8(q_d.reshape(mo, spec.c_e)), rd_w)
        q_r = _epilogue(acc_r, zi[_ID], rd_ws, rd_sc, rd_b,
                        sf[_IR], zi[_IR].astype(jnp.float32), False, qmax)

        # ---- residual QAdd --------------------------------------------------
        if spec.residual:
            xf = (qx2 - z_x.astype(jnp.float32)) * sf[_IX]
            rf = (q_r - zi[_IR].astype(jnp.float32)) * sf[_IR]
            q_o = jnp.clip(jnp.round((xf + rf) / sf[_IADD])
                           + zi[_IADD].astype(jnp.float32), 0.0, qmax)
        else:
            q_o = q_r
        out_ref[:] = (q_o.reshape(bt, ho, wo, spec.cout)
                      .astype(jnp.int32).astype(jnp.uint8))

    return kernel


def _full():
    """Unblocked VMEM operand (weights / per-channel vectors)."""
    return pl.BlockSpec(memory_space=pltpu.VMEM)


def _ch_vec(v, n):
    return jnp.asarray(v, jnp.float32).reshape(1, -1) * jnp.ones((1, n), jnp.float32)


@dataclasses.dataclass(frozen=True)
class FrostBlockInt8Params:
    """Device arrays for one fused block (host-built; see ``build_params``)."""

    sq_w: jnp.ndarray
    sq_ws: jnp.ndarray
    sq_sc: jnp.ndarray
    sq_b: jnp.ndarray
    ex_wa: jnp.ndarray
    ex_wb: jnp.ndarray
    ex_ws: jnp.ndarray
    ex_sc: jnp.ndarray
    ex_b: jnp.ndarray
    dw_w: jnp.ndarray
    dw_sc: jnp.ndarray
    dw_b: jnp.ndarray
    rd_w: jnp.ndarray
    rd_ws: jnp.ndarray
    rd_sc: jnp.ndarray
    rd_b: jnp.ndarray
    scales_f32: jnp.ndarray   # (7,) [s_x, s_sq, s_cat, s_e, s_d, s_r, s_add]
    zps_i32: jnp.ndarray      # (7,) [z_x, z_sq, z_cat, z_e, z_d, z_r, z_add]


jax.tree_util.register_pytree_node(
    FrostBlockInt8Params,
    lambda p: (tuple(getattr(p, f.name) for f in dataclasses.fields(p)), None),
    lambda _, xs: FrostBlockInt8Params(*xs),
)


def build_params(
    spec: FrostBlockSpec,
    *,
    x_scale, x_zp,
    sq=None,            # (qw (1,1,Cin,Cr) s8, scale_vec, bias_vec, out_s, out_zp)
    cat=None,           # (s_cat, z_cat)
    ex=None,            # (qw (1,1,Ccat,E), scale_vec, bias_vec, out_s, out_zp)
    dw=None,            # (qw (k,k,1,E)   , scale_vec, bias_vec, out_s, out_zp)
    rd=None,            # (qw (1,1,E,Cout), scale_vec, bias_vec, out_s, out_zp)
    add=None,           # (s_add, z_add)
) -> FrostBlockInt8Params:
    """Pack HWIO int8 weights + qparams into kernel operands.

    ``scale_vec`` is the PRODUCT in_scale*w_scale per out-channel (what the
    conv epilogue multiplies the int32 accumulator by); ``bias_vec`` the
    folded float bias.
    """
    E, k = spec.c_e, spec.kernel

    def mat(qw):          # (1,1,K,N) -> (K,N) s8
        return jnp.asarray(qw, jnp.int8).reshape(qw.shape[-2], qw.shape[-1])

    def wsum(w2):         # (1, N) i32 column sums
        return jnp.sum(w2.astype(jnp.int32), axis=0, keepdims=True)

    f32 = jnp.float32
    if spec.has_squeeze:
        sq_w = mat(sq[0])
        sq_ws, sq_sc, sq_b = wsum(sq_w), _ch_vec(sq[1], spec.c_sq), _ch_vec(sq[2], spec.c_sq)
    else:  # placeholders keep the operand list static
        sq_w = jnp.zeros((8, 128), jnp.int8)
        sq_ws = jnp.zeros((1, 128), jnp.int32)
        sq_sc = sq_b = jnp.zeros((1, 128), f32)

    if spec.has_expand:
        ex_w = mat(ex[0])
        ex_wa = ex_w[: spec.c_sq] if spec.has_squeeze else ex_w
        ex_wb = ex_w[spec.c_sq:] if spec.has_squeeze else jnp.zeros((8, E), jnp.int8)
        ex_ws, ex_sc, ex_b = wsum(ex_w), _ch_vec(ex[1], E), _ch_vec(ex[2], E)
    else:
        ex_wa = ex_wb = jnp.zeros((8, 128), jnp.int8)
        ex_ws = jnp.zeros((1, 128), jnp.int32)
        ex_sc = ex_b = jnp.zeros((1, 128), f32)

    dw_wq = jnp.asarray(dw[0], jnp.int8).reshape(k * k, E)
    rd_w = mat(rd[0])

    s = [x_scale,
         sq[3] if spec.has_squeeze else 1.0,
         cat[0] if spec.has_squeeze else 1.0,
         ex[3] if spec.has_expand else 1.0,
         dw[3], rd[3],
         add[0] if spec.residual else 1.0]
    z = [x_zp,
         sq[4] if spec.has_squeeze else 0,
         cat[1] if spec.has_squeeze else 0,
         ex[4] if spec.has_expand else 0,
         dw[4], rd[4],
         add[1] if spec.residual else 0]
    return FrostBlockInt8Params(
        sq_w=sq_w, sq_ws=sq_ws, sq_sc=sq_sc, sq_b=sq_b,
        ex_wa=ex_wa, ex_wb=ex_wb, ex_ws=ex_ws,
        ex_sc=ex_sc, ex_b=ex_b,
        dw_w=dw_wq, dw_sc=_ch_vec(dw[1], E), dw_b=_ch_vec(dw[2], E),
        rd_w=rd_w, rd_ws=wsum(rd_w), rd_sc=_ch_vec(rd[1], spec.cout),
        rd_b=_ch_vec(rd[2], spec.cout),
        scales_f32=jnp.stack([jnp.asarray(v, f32).reshape(()) for v in s]),
        zps_i32=jnp.stack([jnp.asarray(v).astype(jnp.int32).reshape(()) for v in z]),
    )


def pick_batch_tile(spec: FrostBlockSpec, batch: int,
                    vmem_budget: int = 8 << 20) -> Optional[int]:
    """Largest tile that divides ``batch`` and keeps the live set in VMEM."""
    hp, wp = spec.h + 2 * spec.pad, spec.w + 2 * spec.pad
    lanes = -(-spec.c_e // 128) * 128
    per_img = hp * wp * lanes * 9 + spec.h * spec.w * (
        -(-spec.cin // 128) * 128) * 8
    for bt in (16, 8, 4, 2, 1):
        if batch % bt == 0 and bt * per_img <= vmem_budget:
            return bt
    return None


@functools.partial(jax.jit, static_argnames=("spec", "bt", "interpret"))
def frost_block_int8(x_q, params: FrostBlockInt8Params, spec: FrostBlockSpec,
                     bt: int = 8, interpret: bool = False):
    """Run one fused INT8 Frost block. x_q: (B, H, W, Cin) uint8."""
    b = x_q.shape[0]
    assert b % bt == 0, (b, bt)
    ho, wo = spec.out_hw
    p = params
    return pl.pallas_call(
        _make_kernel(spec, bt),
        grid=(b // bt,),
        in_specs=[
            pl.BlockSpec((1, 7), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 7), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((bt, spec.h, spec.w, spec.cin),
                         lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
        ] + [_full()] * 16,
        out_specs=pl.BlockSpec((bt, ho, wo, spec.cout),
                               lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, ho, wo, spec.cout), jnp.uint8),
        interpret=interpret,
    )(p.scales_f32.reshape(1, 7), p.zps_i32.reshape(1, 7), x_q,
      p.sq_w, p.sq_ws, p.sq_sc, p.sq_b,
      p.ex_wa, p.ex_wb, p.ex_ws, p.ex_sc, p.ex_b,
      p.dw_w, p.dw_sc, p.dw_b,
      p.rd_w, p.rd_ws, p.rd_sc, p.rd_b)


# ---------------------------------------------------------------------------
# Plain-XLA spec: the exact unfused composition (for tests and A/B timing)
# ---------------------------------------------------------------------------


def reference_frost_block_int8(x_q, params: FrostBlockInt8Params,
                               spec: FrostBlockSpec):
    """The op-by-op XLA composition the model's INT8 path executes."""
    sf = np.asarray(params.scales_f32)
    zi = np.asarray(params.zps_i32)
    qmax = spec.act_qmax

    def conv1x1(q, z_in, w2, ws, sc, b, s_out, z_out, relu):
        m = q.shape[0] * q.shape[1] * q.shape[2]
        x8 = (q.astype(jnp.int32) - 128).astype(jnp.int8).reshape(m, -1)
        acc = jax.lax.dot_general(
            x8, w2, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        acc = acc + (128 - int(z_in)) * ws
        y = acc.astype(jnp.float32) * sc + b
        if relu:
            y = jnp.maximum(y, 0.0)
        out = jnp.clip(jnp.round(y / s_out) + float(z_out), 0, qmax)
        return out.astype(jnp.uint8).reshape(q.shape[:3] + (-1,))

    def requant_u8(q, s_in, z_in, s_out, z_out):
        y = (q.astype(jnp.float32) - float(z_in)) * s_in
        return jnp.clip(jnp.round(y / s_out) + float(z_out), 0, qmax).astype(jnp.uint8)

    h = x_q
    if spec.has_expand:
        if spec.has_squeeze:
            q_s = conv1x1(x_q, zi[_IX], params.sq_w, params.sq_ws,
                          params.sq_sc, params.sq_b, sf[_ISQ], zi[_ISQ], True)
            q_cat = jnp.concatenate([
                requant_u8(q_s, sf[_ISQ], zi[_ISQ], sf[_ICAT], zi[_ICAT]),
                requant_u8(x_q, sf[_IX], zi[_IX], sf[_ICAT], zi[_ICAT]),
            ], axis=-1)
            ex_w = jnp.concatenate([params.ex_wa, params.ex_wb], axis=0)
            h = conv1x1(q_cat, zi[_ICAT], ex_w, params.ex_ws,
                        params.ex_sc, params.ex_b, sf[_IE], zi[_IE], True)
        else:
            h = conv1x1(x_q, zi[_IX], params.ex_wa, params.ex_ws,
                        params.ex_sc, params.ex_b, sf[_IE], zi[_IE], True)
        z_dwin = zi[_IE]
    else:
        z_dwin = zi[_IX]

    # depthwise: zp-padded s8 conv, exactly nn/conv.py:194-207
    k, st, p = spec.kernel, spec.stride, spec.pad
    x8 = (h.astype(jnp.int32) - 128).astype(jnp.int8)
    zp_eff = jnp.int8(int(z_dwin) - 128)
    x8p = jax.lax.pad(x8, zp_eff, ((0, 0, 0), (p, p, 0), (p, p, 0), (0, 0, 0)))
    qw = params.dw_w.reshape(k, k, 1, spec.c_e)
    acc = jax.lax.conv_general_dilated(
        x8p, qw, (st, st), ((0, 0), (0, 0)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=spec.c_e, preferred_element_type=jnp.int32)
    acc = acc - (int(z_dwin) - 128) * jnp.sum(qw.astype(jnp.int32), axis=(0, 1, 2))
    y = acc.astype(jnp.float32) * params.dw_sc + params.dw_b
    y = jnp.maximum(y, 0.0)
    q_d = jnp.clip(jnp.round(y / sf[_ID]) + float(zi[_ID]), 0, qmax).astype(jnp.uint8)

    q_r = conv1x1(q_d, zi[_ID], params.rd_w, params.rd_ws,
                  params.rd_sc, params.rd_b, sf[_IR], zi[_IR], False)
    if spec.residual:
        xf = (x_q.astype(jnp.float32) - float(zi[_IX])) * sf[_IX]
        rf = (q_r.astype(jnp.float32) - float(zi[_IR])) * sf[_IR]
        return jnp.clip(jnp.round((xf + rf) / sf[_IADD]) + float(zi[_IADD]),
                        0, qmax).astype(jnp.uint8)
    return q_r


def _random_conv(rng, cin, cout, k=1, qmax=255):
    """Random calibrated conv operands on realistic scale magnitudes."""
    qw = rng.randint(-127, 128, (k, k, cin if k == 1 else 1, cout), np.int8)
    scale = (rng.rand(cout).astype(np.float32) * 1e-3 + 1e-4)
    bias = rng.randn(cout).astype(np.float32) * 0.05
    out_s = np.float32(rng.rand() * 0.05 + 0.01)
    out_zp = np.int32(rng.randint(0, qmax))
    return qw, scale, bias, out_s, out_zp


def random_block_case(spec: FrostBlockSpec, batch: int, seed: int = 0):
    """(x_q, params) with random weights/qparams for ``spec`` — the one
    fixture shared by tests/test_pallas_frost_block.py and
    scripts/probe_frost_block.py so the operand format stays in lockstep
    with :func:`build_params`. Respects ``spec.act_qmax`` (fbgemm
    reduce_range grids stay within [0, 127])."""
    rng = np.random.RandomState(seed)
    qmax = spec.act_qmax
    x_q = jnp.asarray(rng.randint(0, qmax + 1,
                                  (batch, spec.h, spec.w, spec.cin), np.uint8))
    c_cat = spec.c_sq + spec.cin if spec.has_squeeze else spec.cin
    params = build_params(
        spec,
        x_scale=np.float32(0.02), x_zp=np.int32(114 if qmax > 127 else 60),
        sq=(_random_conv(rng, spec.cin, spec.c_sq, qmax=qmax)
            if spec.has_squeeze else None),
        cat=((np.float32(0.018), np.int32(min(120, qmax - 7)))
             if spec.has_squeeze else None),
        ex=(_random_conv(rng, c_cat, spec.c_e, qmax=qmax)
            if spec.has_expand else None),
        dw=_random_conv(rng, 1, spec.c_e, k=spec.kernel, qmax=qmax),
        rd=_random_conv(rng, spec.c_e, spec.cout, qmax=qmax),
        add=((np.float32(0.03), np.int32(100)) if spec.residual else None),
    )
    return x_q, params
