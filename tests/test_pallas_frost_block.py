"""Fused INT8 Frost-block Pallas kernel: bit-exact vs the unfused XLA chain."""
import numpy as np
import pytest

from frostnet_tpu.ops.pallas_frost_block import (

    FrostBlockSpec,
    frost_block_int8,
    pick_batch_tile,
    random_block_case,
    reference_frost_block_int8,
)


CASES = [
    # CAS block, k5, stride 1, residual (stage-4 pattern at 14x14)
    FrostBlockSpec(h=14, w=14, cin=96, cout=96, kernel=5, stride=1,
                   has_squeeze=True, has_expand=True, c_sq=24, c_e=360,
                   residual=True),
    # CAS block, k5, stride 2 downsample (stage boundary)
    FrostBlockSpec(h=28, w=28, cin=40, cout=80, kernel=5, stride=2,
                   has_squeeze=True, has_expand=True, c_sq=16, c_e=336,
                   residual=False),
    # MB fallback (squeezed width < 8): no squeeze/cat
    FrostBlockSpec(h=56, w=56, cin=24, cout=24, kernel=3, stride=1,
                   has_squeeze=False, has_expand=True, c_sq=0, c_e=144,
                   residual=True),
    # expand_ratio == 1 (first block): dw + reduce only
    FrostBlockSpec(h=32, w=32, cin=16, cout=16, kernel=3, stride=1,
                   has_squeeze=False, has_expand=False, c_sq=0, c_e=16,
                   residual=True),
    # fbgemm reduce_range activations: every clamp must cut at 127, not 255
    FrostBlockSpec(h=14, w=14, cin=96, cout=96, kernel=5, stride=1,
                   has_squeeze=True, has_expand=True, c_sq=24, c_e=360,
                   residual=True, act_qmax=127),
]


@pytest.mark.parametrize("spec", CASES, ids=lambda s: (
    f"{'cas' if s.has_squeeze else ('mb' if s.has_expand else 'e1')}"
    f"_k{s.kernel}s{s.stride}{'r' if s.residual else ''}"))
def test_fused_block_bit_exact(spec):
    batch = 4
    x_q, params = random_block_case(spec, batch, seed=hash(spec) % 2**31)
    want = np.asarray(reference_frost_block_int8(x_q, params, spec))
    got = np.asarray(frost_block_int8(x_q, params, spec, bt=2, interpret=True))
    assert want.shape == got.shape
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("backend", ["qnnpack", "fbgemm"])
def test_model_fused_matches_unfused(backend):
    """FrostNet(fuse_int8=True) INT8 logits are bit-identical to the unfused

# Heavy tier: excluded from `pytest -m "not slow"` (the sub-15-min fast signal)
pytestmark = pytest.mark.slow

    INT8 path on the same calibrated variables (the wiring contract:
    models/frostnet.py CascadePreExBottleneck._fused_int8) — for both the
    per-tensor u8[0,255] qnnpack grid and fbgemm's reduce_range [0,127]."""
    import jax

    from frostnet_tpu import nn as fnn_q
    from frostnet_tpu.models import create_model
    from frostnet_tpu.quant import get_qconfig

    kw = dict(num_classes=10, qconfig=get_qconfig(backend))
    plain = create_model("frostnet_quant_small_0_35", **kw)
    fused = create_model("frostnet_quant_small_0_35", fuse_int8=True, **kw)

    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (2, 32, 32, 3))
    variables = jax.jit(plain.init)(key, x)
    train_fn = jax.jit(lambda v, xb: plain.apply(
        v, xb, mode=fnn_q.QAT, train=True,
        mutable=["batch_stats", "quant"], rngs={"dropout": key}))
    for i in range(2):
        xb = jax.random.normal(jax.random.fold_in(key, i), (2, 32, 32, 3))
        _, updates = train_fn(variables, xb)
        variables = {**variables, **updates}

    want = jax.jit(lambda v, xb: plain.apply(v, xb, mode=fnn_q.INT8))(variables, x)
    got = jax.jit(lambda v, xb: fused.apply(v, xb, mode=fnn_q.INT8))(variables, x)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_pick_batch_tile_fits():
    spec = CASES[0]
    assert pick_batch_tile(spec, 128) in (16, 8, 4, 2, 1)
    # absurd spatial size -> no tile fits
    huge = FrostBlockSpec(h=512, w=512, cin=64, cout=64, kernel=5, stride=1,
                          has_squeeze=True, has_expand=True, c_sq=16,
                          c_e=768, residual=True)
    assert pick_batch_tile(huge, 128) is None
