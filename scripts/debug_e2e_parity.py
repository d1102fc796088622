"""Debug: compare per-layer observer min/max between torch prepare_qat and
our QAT mode after identical calibration batches."""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp
import torch
import torch.ao.quantization as tq

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
jax.config.update("jax_compilation_cache_dir", "/root/repo/.cache/jax")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from frostnet_tpu.models.frostnet import FrostNet
from frostnet_tpu.models.frostnet_features import load_torch_frostnet_checkpoint
from frostnet_tpu.nn import QAT
from tests.test_frostnet_model import _load_reference_frostnet

NCLASS, IMG, BS = 8, 64, 4
ref = _load_reference_frostnet()
torch.manual_seed(0)
tmodel = ref.FrostNet(nclass=NCLASS, mode="small", width_mult=0.35,
                      quantized=True, drop_rate=0.0,
                      bottleneck=ref.CascadePreExBottleneck)
tmodel.eval()
fp_state = {("module." + k): v for k, v in tmodel.state_dict().items()}

model = FrostNet(mode="small", width_mult=0.35, quantized=True,
                 num_classes=NCLASS, drop_rate=0.0)
x0 = jnp.zeros((BS, IMG, IMG, 3), jnp.float32)
variables = jax.jit(lambda k, x: model.init(k, x, mode=QAT, train=True))(
    jax.random.PRNGKey(0), x0)
variables = dict(load_torch_frostnet_checkpoint(fp_state, variables))

tmodel.train()
orig = torch.quantization.fuse_modules
torch.quantization.fuse_modules = tq.fuse_modules_qat
tmodel.fuse_model()
torch.quantization.fuse_modules = orig
tmodel.qconfig = tq.get_default_qat_qconfig("qnnpack")
tq.prepare_qat(tmodel, inplace=True)

rng = np.random.RandomState(7)
xb = rng.randn(BS, IMG, IMG, 3).astype(np.float32)
with torch.no_grad():
    tmodel(torch.from_numpy(xb.transpose(0, 3, 1, 2)))
_, mut = model.apply(variables, jnp.asarray(xb), mode=QAT, train=True,
                     mutable=["quant", "batch_stats"])
variables.update(mut)

def tminmax(fq):
    o = fq.activation_post_process
    if not hasattr(o, "min_val"):
        o = o.activation_post_process
    return float(o.min_val), float(o.max_val)

def ours(path):
    node = variables["quant"]
    for p in path:
        node = node[p]
    return float(node["min"]), float(node["max"]) if isinstance(node, dict) else node

print("quant collection top keys:", list(variables["quant"].keys())[:10])

# QuantStub
print("torch quantstub:", tminmax(tmodel.quant))
qs = variables["quant"]["quant"]
print("ours quantstub raw:", jax.tree.map(lambda x: np.asarray(x).tolist(), qs))

# stem conv1
print("torch conv1 act:", tminmax(tmodel.conv1.conv[0]))
print("torch conv1 w:", tminmax(tmodel.conv1.conv[0].weight_fake_quant))
c1 = variables["quant"]["conv1"]
print("ours conv1:", jax.tree.map(lambda x: np.asarray(x).tolist(), c1))

# first block
b = tmodel.layer1[0]
print("torch layer1.0 conv2 act:", tminmax(b.conv2.conv[0]))
print("torch layer1.0 reduce act:", tminmax(b.reduce_conv.conv[0]))
l10 = variables["quant"]["layer1_0"]
print("ours layer1_0 keys:", list(l10.keys()))
print("ours layer1_0:", jax.tree.map(lambda x: np.asarray(x).tolist(), l10))

# classifier
print("torch classifier act:", tminmax(tmodel.classifier[2]))
print("torch last_layer act:", tminmax(tmodel.last_layer.conv[0]))
cl = variables["quant"]["classifier"]
print("ours classifier:", jax.tree.map(lambda x: np.asarray(x).tolist(), cl))
ll = variables["quant"]["last_layer"]
print("ours last_layer:", jax.tree.map(lambda x: np.asarray(x).tolist(), ll))
