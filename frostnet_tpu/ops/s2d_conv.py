"""Space-to-depth reformulation of stride-1 convs with tiny channel counts.

Round-4 GAN INT8 profiling (scripts/profile_gan_int8.py, hardware trace):
the pix2pix generator's FP tail — reflection-pad + 7x7 VALID conv 64->3 at
256x256 (gan/networks.py ResnetGenerator tail, reference
Style_Transfer/models/networks.py:421-425) — costs 4.6 ms/step, 29% of the
whole INT8 forward. Cout=3 occupies 3 of the MXU's 128 output lanes, so the
conv runs at ~2.3% utilization; the measured 4.6 ms matches the padded-lane
model exactly (19.7 GFLOP / (3/128 * 197 TF) = 4.3 ms).

The fix is the classic TPU space-to-depth transform: an odd-k stride-1
SAME(zero-pad) conv equals

    d2s( conv_kb(s2d(x, b), W', pad=pb), b )

with b the block size, pb = ceil((k//2)/b), kb = 2*pb+1, and W' a
zero-padded rearrangement of w:

    W'[a, b_, (sy*b+sx)*Cin + ci, (ry*b+rx)*Cout + c]
        = w[dy, dx, ci, c]   where dy = b*(a-pb) + sy + k//2 - ry
                                   dx = b*(b_-pb) + sx + k//2 - rx
          (zero when dy/dx fall outside [0, k))

For the GAN tail (k=7, b=4): a 3x3 conv over 16*Cin -> 16*Cout channels —
2.94x the MACs of the original but 16x the output-lane utilization, ~5x
faster on the MXU. The rearranged weights derive from ``w`` by gather, so
gradients flow and the same formulation serves FP32/QAT/INT8-tail modes.

Exactness: the transform reorders the contraction (taps regroup across
blocks), so f32 results differ from ``lax.conv`` by normal reassociation
ulps — NOT bit-equal. It is therefore applied only to FLOAT convs (the
INT8 integer path must stay bit-stable and already has its own kernels).
"""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp


def plan(k: int, block: int, h: int, w: int, cout: int):
    """Return (pb, kb) if the s2d transform applies, else None.

    Gates: odd square kernel with k//2 >= 1, spatial dims divisible by
    ``block``, and a small enough Cout that lane padding dominates (the
    transform pays ~((kb*b)/k)^2 extra MACs, worth it only when the
    original runs nearly empty).
    """
    if k % 2 == 0 or k < 3:
        return None
    if h % block or w % block:
        return None
    if cout * block * block > 128:  # packed channels beyond one lane tile
        return None
    pb = -(-(k // 2) // block)
    kb = 2 * pb + 1
    # Time ratio new/old = MAC multiplier (kb*b/k)^2 divided by the lane-
    # utilization gain min(128/cout, b^2); require a clear >2x modeled win
    # so marginal shapes keep the native conv.
    if 2 * (kb * block / k) ** 2 > min(128 / cout, float(block * block)):
        return None
    return pb, kb


def pack_weights(w: jax.Array, block: int, pb: int, kb: int) -> jax.Array:
    """Rearrange (k,k,Cin,Cout) into the block-space (kb,kb,b²Cin,b²Cout)."""
    k, k2, cin, cout = w.shape
    assert k == k2
    half = k // 2
    pad = block * pb
    wp = jnp.pad(w, ((pad, pad), (pad, pad), (0, 0), (0, 0)))
    # idx[a, s, r] = dy + pad = block*a + s + half - r
    a = np.arange(kb)[:, None, None]
    s = np.arange(block)[None, :, None]
    r = np.arange(block)[None, None, :]
    # raw idx can leave [0, k + 2*pad) by up to block-1 when block > half+1
    # (e.g. k=5, b=4). Those taps are zeros by construction; clip them into
    # the pad region (pad = block*pb >= block > the overshoot, so clipped
    # indices always read explicit zero padding, never real weights).
    idx = np.clip(block * a + s + half - r, 0, k + 2 * pad - 1)
    w2 = wp[idx][:, :, :, idx]  # (a, sy, ry, b_, sx, rx, cin, cout)
    w2 = w2.transpose(0, 3, 1, 4, 6, 2, 5, 7)  # (a, b_, sy, sx, ci, ry, rx, c)
    return w2.reshape(kb, kb, block * block * cin, block * block * cout)


def space_to_depth(x: jax.Array, block: int) -> jax.Array:
    b, h, w, c = x.shape
    x = x.reshape(b, h // block, block, w // block, block, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(
        b, h // block, w // block, block * block * c)


def depth_to_space(y: jax.Array, block: int) -> jax.Array:
    b, hb, wb, cb = y.shape
    c = cb // (block * block)
    y = y.reshape(b, hb, wb, block, block, c)
    return y.transpose(0, 1, 3, 2, 4, 5).reshape(b, hb * block, wb * block, c)


def conv_same_s2d(x: jax.Array, w: jax.Array, block: int, pb: int, kb: int,
                  precision=None) -> jax.Array:
    """Stride-1 SAME (zero-pad) conv via space-to-depth.

    x: (B, H, W, Cin) with H % block == W % block == 0.
    w: (k, k, Cin, Cout), k odd. Returns (B, H, W, Cout), equal to
    ``lax.conv_general_dilated(x, w, SAME)`` up to f32 reassociation.
    """
    w2 = pack_weights(w, block, pb, kb)
    xs = space_to_depth(x, block)
    y = jax.lax.conv_general_dilated(
        xs, w2, (1, 1), ((pb, pb), (pb, pb)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"), precision=precision)
    return depth_to_space(y, block)
