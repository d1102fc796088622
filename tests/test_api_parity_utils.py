"""Tests for parity APIs that no trainer exercises directly.

These exist because the reference exposes them (BCE seg-loss branch, box
center_form, WGAN-GP penalty, FLOPs/param report, dataset presence check) —
each gets a correctness test so none of them rots as exported-but-untested
surface.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from frostnet_tpu.detection import center_form, point_form
from frostnet_tpu.utils.losses import binary_cross_entropy_with_logits


def test_bce_with_logits_matches_torch():
    """SegmentationLoss bce branch (segmentation_loss.py:20-35) numerics."""
    rng = np.random.RandomState(0)
    logits = rng.randn(4, 8, 8, 3).astype(np.float32) * 2
    targets = (rng.rand(4, 8, 8, 3) > 0.5).astype(np.float32)
    ours = float(binary_cross_entropy_with_logits(jnp.asarray(logits),
                                                  jnp.asarray(targets)))
    ref = float(F.binary_cross_entropy_with_logits(
        torch.from_numpy(logits), torch.from_numpy(targets)))
    assert abs(ours - ref) < 1e-6

    pw = np.float32(3.0)
    ours_w = float(binary_cross_entropy_with_logits(
        jnp.asarray(logits), jnp.asarray(targets), pos_weight=pw))
    ref_w = float(F.binary_cross_entropy_with_logits(
        torch.from_numpy(logits), torch.from_numpy(targets),
        pos_weight=torch.tensor(pw)))
    assert abs(ours_w - ref_w) < 1e-6


def test_center_point_form_roundtrip():
    """box_utils center/point conversions (box_utils.py:17-40) invert each
    other and match the closed form."""
    rng = np.random.RandomState(1)
    cxcywh = np.abs(rng.rand(32, 4)).astype(np.float32) + 0.1
    xyxy = point_form(jnp.asarray(cxcywh))
    back = center_form(xyxy)
    np.testing.assert_allclose(np.asarray(back), cxcywh, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(xyxy[:, 2] - xyxy[:, 0]), cxcywh[:, 2], rtol=1e-5)


def test_gradient_penalty_analytic():
    """WGAN-GP penalty (networks.py:370-403): for D(x) = k*sum(x) the
    per-sample gradient is constant k, so the penalty is exactly
    lambda * (k*sqrt(N) - 1)^2, independent of the interpolates."""
    k = 0.25
    real = jnp.ones((3, 4, 4, 1))
    fake = jnp.zeros((3, 4, 4, 1))
    n = 4 * 4 * 1

    from frostnet_tpu.gan import gradient_penalty

    def d_apply(vars_, x):
        return k * jnp.sum(x.reshape(x.shape[0], -1), axis=1)

    got = float(gradient_penalty(d_apply, {}, real, fake,
                                 jax.random.PRNGKey(0), constant=1.0,
                                 lambda_gp=10.0))
    want = 10.0 * (k * np.sqrt(n) - 1.0) ** 2
    assert abs(got - want) < 1e-4


def test_wgangp_gan_loss_signs():
    from frostnet_tpu.gan.networks import gan_loss

    pred = jnp.asarray([[1.0], [3.0]])
    assert float(gan_loss(pred, True, "wgangp")) == -2.0   # -mean(pred)
    assert float(gan_loss(pred, False, "wgangp")) == 2.0
    with pytest.raises(ValueError):
        gan_loss(pred, True, "nope")


def test_model_flops_params_report():
    """model_flops_params (the reference's compute_flops/model_parameters
    report, utilities/utils.py:45-62) returns XLA-counted flops and the
    exact param count."""
    from frostnet_tpu.models import create_model
    from frostnet_tpu.utils import count_params, model_flops_params

    model = create_model("frostnet_quant_small_0_35", num_classes=10)
    flops, params = model_flops_params(model, input_shape=(1, 32, 32, 3))
    assert flops > 1e6  # a real conv net forward
    v = jax.eval_shape(lambda k, x: model.init(k, x),
                       jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    assert params == count_params(
        jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), v)["params"])


def test_cross_replica_mean_under_shard_map():
    """psum-mean helper for shard_map'd code paths (BN stat sync)."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from frostnet_tpu.parallel import cross_replica_mean, make_mesh

    if jax.device_count() < 8:
        pytest.skip("needs the 8-device CPU mesh")
    mesh = make_mesh()
    x = jnp.arange(8.0)

    @jax.jit
    def mean_over_dp(x):
        f = shard_map(lambda v: cross_replica_mean(v, "dp"), mesh=mesh,
                      in_specs=P("dp"), out_specs=P("dp"))
        return f(x)

    out = np.asarray(mean_over_dp(x))
    np.testing.assert_allclose(out, np.full(8, np.arange(8.0).mean()),
                               rtol=1e-6)


def test_download_data_validates_presence(tmp_path):
    """No-egress stand-in for the reference's auto-download
    (data_functions.py:12-209): explains instead of failing obscurely."""
    from frostnet_tpu.data import download_data

    with pytest.raises(FileNotFoundError, match="no network"):
        download_data("imagenet_tiny", str(tmp_path))
    (tmp_path / "imagenet_tiny").mkdir()
    assert download_data("imagenet_tiny", str(tmp_path)) == str(
        tmp_path / "imagenet_tiny")


def test_fake_quantize_observed_composition():
    """fake_quantize_observed == calculate_qparams + fake_quantize."""
    from frostnet_tpu.quant import (QNNPACK, ObserverState, calculate_qparams,
                                    fake_quantize, fake_quantize_observed)

    spec = QNNPACK.activation
    state = ObserverState(min_val=jnp.asarray(-1.5), max_val=jnp.asarray(2.5))
    x = jnp.linspace(-2.0, 3.0, 64)
    scale, zp = calculate_qparams(state, spec)
    want = fake_quantize(x, scale, zp, spec)
    got = fake_quantize_observed(x, state, spec)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_from_json_accepts_reference_train_json(tmp_path):
    """ClassificationConfig.from_json consumes the reference's
    setting/train.json VERBATIM: nested train_config/data_config sections,
    Model/FP_epoch/warmup_epoch/dataset_name spellings, resume as a path
    string, ILSVRC2015 as the imagenet name (train.py:46-67)."""
    import json
    from frostnet_tpu.train.classification import ClassificationConfig

    with open("/root/reference/Classification/setting/train.json") as f:
        ref = json.load(f)
    p = tmp_path / "train.json"
    p.write_text(json.dumps(ref))
    cfg = ClassificationConfig.from_json(str(p))
    tc, dc = ref["train_config"], ref["data_config"]
    assert cfg.model == tc["Model"]
    assert cfg.fp_epochs == tc["FP_epoch"]
    assert cfg.warmup_epochs == tc["warmup_epoch"]
    assert cfg.learning_rate == tc["learning_rate"]
    assert cfg.epochs == tc["epochs"]
    assert cfg.optim == tc["optim"]
    assert cfg.lrsch == tc["lrsch"]
    assert cfg.clip_by == tc["clip_by"]
    assert cfg.noise_decay == tc["noise_decay"]
    assert cfg.toss_coin == tc["toss_coin"]
    assert cfg.nesterov == tc["nesterov"]
    assert cfg.amsgrad == tc["amsgrad"]
    assert cfg.annealing == tc["annealing"]
    assert cfg.restart_epoch == tc["restart_epoch"]
    assert cfg.resume is False  # "" -> no resume
    assert cfg.dataset == "imagenet"  # ILSVRC2015 alias
    assert cfg.num_classes == dc["num_classes"]


def test_annealing_restart_schedule_cycles():
    """annealing=true makes cos_lr cyclic with period restart_epoch
    (helper_functions.py:231-249: epoch % restart_epochs)."""
    import numpy as np
    from frostnet_tpu.optim.schedules import warmup_cosine

    base, period = 0.1, 50
    sched = warmup_cosine(base, total_steps=1000, restart_period=period)
    for step in (0, 10, 49):
        np.testing.assert_allclose(float(sched(step)),
                                   float(sched(step + period)), rtol=1e-6)
    # decays within a cycle, resets at the boundary
    assert float(sched(49)) < float(sched(0)) * 0.02
    np.testing.assert_allclose(float(sched(period)), base, rtol=1e-6)


def test_adam_amsgrad_bitmatches_torch():
    """amsgrad takes the running max over the RAW second moment and
    bias-corrects the max afterward — torch.optim.Adam(amsgrad=True)
    semantics, which the reference QAdam/QAdamW amsgrad branch copies
    (optimizer.py:500-504). optax.scale_by_amsgrad maxes the CORRECTED
    nu_hat instead, so we carry our own transform; oracle-match it over a
    trajectory with an early gradient spike (the case where the two
    definitions diverge by up to ~30x)."""
    import jax.numpy as jnp
    import numpy as np
    import torch
    from frostnet_tpu.optim.gradboost import adam

    rng = np.random.RandomState(0)
    w0 = rng.randn(5).astype(np.float32)
    grads = [rng.randn(5).astype(np.float32) * (100.0 if t == 0 else 1.0)
             for t in range(8)]

    tw = torch.tensor(w0.copy(), requires_grad=True)
    topt = torch.optim.Adam([tw], lr=1e-2, amsgrad=True)
    for g in grads:
        topt.zero_grad()
        tw.grad = torch.tensor(g)
        topt.step()

    tx = adam(1e-2, amsgrad=True)
    params = {"w": jnp.asarray(w0)}
    st = tx.init(params)
    for g in grads:
        upd, st = tx.update({"w": jnp.asarray(g)}, st, params)
        params = {"w": params["w"] + upd["w"]}
    np.testing.assert_allclose(np.asarray(params["w"]),
                               tw.detach().numpy(), rtol=1e-5, atol=1e-6)


def test_adamw_accepts_grouped_weight_decay():
    """The classification trainer hands every optimizer
    grouped_weight_decay (a GradientTransformation); optax.adamw expected a
    float and crashed for optim=AdamW/QAdamW (round-3 review fix). The
    grouped transform placed after the moment scaling IS decoupled decay."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from frostnet_tpu.optim.gradboost import (adamw, grouped_weight_decay,
                                              qadamw)

    params = {"k": jnp.ones((3, 3, 4, 8)), "b": jnp.ones(8)}
    grads = jax.tree.map(lambda p: jnp.full_like(p, 0.1), params)
    for tx in (adamw(1e-3, weight_decay=grouped_weight_decay(1e-4)),
               qadamw(1e-3, weight_decay=grouped_weight_decay(1e-4)),
               adamw(1e-3, weight_decay=grouped_weight_decay(1e-4),
                     amsgrad=True)):
        st = tx.init(params)
        upd, _ = tx.update(grads, st, params)
        assert all(np.isfinite(np.asarray(u)).all()
                   for u in jax.tree.leaves(upd))


def test_evaluator_accepts_reference_evaluate_json():
    """-c setting/evaluate.json (reference layout) maps onto the evaluator's
    argparse defaults (evaluate.py:28): Model/weight_name spellings, nested
    test_config/data_config sections."""
    from frostnet_tpu.train.evaluate import _json_defaults

    d = _json_defaults("/root/reference/Classification/setting/evaluate.json")
    assert d["model"] == "mobilenet_v2"
    assert "checkpoint" not in d  # weight_name "" means no checkpoint
    assert d["batch_size"] == 1
    # that file's dataset_name is 'imagenet_tiny' — kept verbatim (only the
    # ILSVRC2015 alias rewrites); it resolves as an ImageFolder name here
    assert d["dataset"] == "imagenet_tiny"


def test_from_json_preserves_resume_path(tmp_path):
    """A reference train.json with resume as a checkpoint path must keep the
    PATH (restored from that location), not collapse to a bare bool that
    silently trains from scratch (round-3 review fix)."""
    import json
    from frostnet_tpu.train.classification import ClassificationConfig

    p = tmp_path / "t.json"
    p.write_text(json.dumps(
        {"train_config": {"resume": "./other_run/checkpoint"}}))
    cfg = ClassificationConfig.from_json(str(p))
    assert cfg.resume is True
    assert cfg.resume_path == "./other_run/checkpoint"
