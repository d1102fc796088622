"""Fused Pallas kernels for dense 3x3 stride-1 INT8 convolutions.

Round-4 GAN INT8 profiling (scripts/profile_gan_int8.py, hardware trace):
the pix2pix ResnetGenerator spends 7.6 ms/step in the s32 ``lax.conv``
dense path plus ~2.5 ms of unfused ``add_convert`` requant epilogues and
~1.4 ms of s32 layout copies — the int32 accumulator round-trips HBM at
8 B/elem because XLA cannot fuse an epilogue into a convolution on TPU.
The 12 ResnetBlock convs (3x3, s1, 256ch at 64x64) carry ~80% of the
generator's FLOPs and all have the same friendly shape.

Both variants compute the whole conv + requant chain in VMEM:

    acc(s32)  = sum_{dy,dx} x8[:, dy:dy+H, dx:dx+W, :] @ w[dy, dx]   (MXU,
                native int8 x int8 -> int32)
    acc      -= zp_term                  (per-channel zero-point correction)
    y(f32)    = acc * comb + bias        (dequant + folded bias)
    y         = relu(y)                  (optional)
    out(u8)   = clip(round(y / s_out) + z_out, qmin, qmax)

bit-identically to the unfused XLA composition in nn/conv.py's INT8 dense
branch (same op sequence, same IEEE f32 arithmetic — exact-equality
tested). Grid is (batch, H-tiles); the (padded) input stays resident in
VMEM across the H-tiles of one batch element (the block index map is
constant in the tile dimension, so Pallas skips the re-DMA), and only the
uint8 output tile leaves the kernel — HBM traffic is int8 in / uint8 out.

Variants:

- ``resident`` (v1): the padded image is the kernel operand; each of the
  nine taps slices it at W-offsets 0/1/2. W is the int8 block's sublane
  dim, so offsets 1 and 2 are tile-unaligned and Mosaic emits a relayout
  per tap. MEASURED (2026-08-19, v5e, quiet host, whole-net frozen-INT8
  pix2pix resnet_9blocks 16x256x256, chained-readback protocol):
  bit-identical but SLOWER than the XLA composition — 18.4 vs 16.0
  ms/batch (0.87x). Kept for A/B comparison.
- ``preshift`` (v2): the three dx-shifted views are stacked OUTSIDE the
  kernel (one XLA slice+concat copy, int8 so ~3x the input bytes); in-kernel
  slicing then touches only untiled dims (shift index and H), so no
  relayouts remain. MEASURED (2026-08-19, same whole-net protocol as v1):
  SLOWER still — 20.9 ms/batch vs XLA 16.1 (0.77x); the 3x stacked input
  blows the per-batch VMEM residency (12.4 MB at 64x64x256) and its HBM
  copy costs more than the relayouts it removes.

Both variants lose the whole-net A/B (scripts/bench_gan_int8_ab.py), so
the kernel is OFF by default everywhere; the XLA s32-conv composition is
the production path. Kept as the measured record that VMEM-resident
Pallas formulations of this op were tried and beaten by XLA on v5e.

Reference parity context: the reference serves converted qnnpack Conv2d
modules whose requant epilogue is fused inside the qnnpack microkernel
(torch.ao.nn.quantized.Conv2d); this is the TPU-native equivalent of that
fusion. Gated by nn/conv.py for 3x3/s1/groups=1 INT8 convs when the
operands fit the VMEM budget; everything else keeps the XLA formulations.
The fused path is OFF by default (nn/conv.py set_pallas_int8_dense) until
a formulation wins the whole-net A/B on the chip.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# VMEM is ~16 MB/core; leave headroom for Mosaic's own buffers and the
# double-buffered output tile.
_VMEM_BUDGET = 12 * 1024 * 1024

VARIANT = "preshift"  # module default; see docstring


def _estimate_vmem(hp, wp, cin, cout, th, w, variant):
    if variant == "preshift":
        x_bytes = 3 * hp * w * cin     # stacked shifted views, int8, resident
    else:
        x_bytes = hp * wp * cin        # padded image, int8, resident
    w_bytes = 9 * cin * cout           # weights, int8
    # acc (s32) + y (f32) tiles + u8 output tile (double-buffered)
    tile = th * w * cout
    return x_bytes + w_bytes + tile * (4 + 4) + 2 * tile


def pick_h_tile(hp, wp, cin, cout, variant=None):
    """Largest output-row tile that fits the VMEM budget (None = no fit)."""
    variant = variant or VARIANT
    h = hp - 2
    w = wp - 2
    th = h
    while th >= 8:
        if h % th == 0 and _estimate_vmem(hp, wp, cin, cout, th, w,
                                          variant) <= _VMEM_BUDGET:
            return th
        th //= 2
    return None


def _epilogue(acc, sc_ref, comb_ref, bias_ref, zpt_ref, o_ref, *,
              th, w_out, cout, relu, qmin, qmax):
    acc = acc - zpt_ref[:]
    y = acc.astype(jnp.float32) * comb_ref[:] + bias_ref[:]
    if relu:
        y = jnp.maximum(y, 0.0)
    s_out = sc_ref[0, 0]
    z_out = sc_ref[0, 1]
    q = jnp.clip(jnp.round(y / s_out) + z_out, float(qmin), float(qmax))
    # Mosaic has no f32->u8 cast; hop through i32 (exact for [0,255])
    o_ref[0] = q.astype(jnp.int32).astype(jnp.uint8).reshape(th, w_out, cout)


def _kernel_resident(sc_ref, x_ref, w_ref, comb_ref, bias_ref, zpt_ref,
                     o_ref, *, th, w_out, cin, cout, relu, qmin, qmax):
    ht = pl.program_id(1)
    acc = jnp.zeros((th * w_out, cout), jnp.int32)
    for dy in range(3):
        for dx in range(3):
            xs = x_ref[0, pl.ds(ht * th + dy, th), dx:dx + w_out, :]
            acc = acc + jax.lax.dot_general(
                xs.reshape(th * w_out, cin), w_ref[dy, dx],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
    _epilogue(acc, sc_ref, comb_ref, bias_ref, zpt_ref, o_ref, th=th,
              w_out=w_out, cout=cout, relu=relu, qmin=qmin, qmax=qmax)


def _kernel_preshift(sc_ref, xs_ref, w_ref, comb_ref, bias_ref, zpt_ref,
                     o_ref, *, th, w_out, cin, cout, relu, qmin, qmax):
    ht = pl.program_id(1)
    acc = jnp.zeros((th * w_out, cout), jnp.int32)
    for dy in range(3):
        for dx in range(3):
            # dims sliced here (shift index, H) are untiled -> no relayout
            xs = xs_ref[0, dx, pl.ds(ht * th + dy, th), :, :]
            acc = acc + jax.lax.dot_general(
                xs.reshape(th * w_out, cin), w_ref[dy, dx],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
    _epilogue(acc, sc_ref, comb_ref, bias_ref, zpt_ref, o_ref, th=th,
              w_out=w_out, cout=cout, relu=relu, qmin=qmin, qmax=qmax)


@functools.partial(jax.jit, static_argnames=("th", "relu", "qmin", "qmax",
                                             "variant", "interpret"))
def conv3x3_s1_int8(x8p, qw, comb, bias, zp_term, out_scale, out_zp, *,
                    th: int, relu: bool, qmin: int, qmax: int,
                    variant: Optional[str] = None, interpret: bool = False):
    """Fused 3x3/s1 dense INT8 conv + requant.

    x8p: (B, H+2, W+2, Cin) int8, already padded with the effective zero
         point (nn/conv.py qnnpack pad semantics).
    qw:  (3, 3, Cin, Cout) int8 folded+quantized weights.
    comb: (Cout,) f32 = x_scale * w_scale (per-channel or broadcast).
    bias: (Cout,) f32 folded bias.
    zp_term: (Cout,) i32 = zp_eff * sum(qw) per out-channel.
    out_scale/out_zp: activation observer qparams (traced f32 scalars).
    Returns (B, H, W, Cout) uint8 on the output observer's grid.
    """
    variant = variant or VARIANT
    b, hp, wp, cin = x8p.shape
    cout = qw.shape[-1]
    h, w = hp - 2, wp - 2
    assert h % th == 0, (h, th)
    scalars = jnp.stack([out_scale.astype(jnp.float32),
                         out_zp.astype(jnp.float32)]).reshape(1, 2)
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    if variant == "preshift":
        kern = _kernel_preshift
        x_in = jnp.stack([x8p[:, :, dx:dx + w, :] for dx in range(3)], axis=1)
        x_spec = pl.BlockSpec((1, 3, hp, w, cin), lambda i, j: (i, 0, 0, 0, 0),
                              memory_space=pltpu.VMEM)
    else:
        kern = _kernel_resident
        x_in = x8p
        x_spec = pl.BlockSpec((1, hp, wp, cin), lambda i, j: (i, 0, 0, 0),
                              memory_space=pltpu.VMEM)
    kern = functools.partial(kern, th=th, w_out=w, cin=cin, cout=cout,
                             relu=relu, qmin=qmin, qmax=qmax)
    return pl.pallas_call(
        kern,
        grid=(b, h // th),
        in_specs=[
            pl.BlockSpec((1, 2), lambda i, j: (0, 0),
                         memory_space=pltpu.SMEM),
            x_spec,
            full, full, full, full,
        ],
        out_specs=pl.BlockSpec((1, th, w, cout), lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, w, cout), jnp.uint8),
        interpret=interpret,
    )(scalars, x_in, qw,
      comb.astype(jnp.float32).reshape(1, cout),
      bias.astype(jnp.float32).reshape(1, cout),
      zp_term.astype(jnp.int32).reshape(1, cout))


def usable(kh, kw, strides, dilation, groups, act: Optional[str],
           x8p_shape, cout):
    """Shape gate for the fused path (everything else -> XLA formulations)."""
    if (kh, kw) != (3, 3) or strides != (1, 1) or dilation != (1, 1):
        return None
    if groups != 1 or act not in (None, "relu"):
        return None
    b, hp, wp, cin = x8p_shape
    if hp - 2 < 8 or (wp - 2) % 8 != 0 or cin % 128 != 0 or cout % 128 != 0:
        # small/ragged shapes: Mosaic padding waste exceeds the fusion win
        return None
    return pick_h_tile(hp, wp, cin, cout)
