"""frostnet_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework with the
capabilities of clovaai/frostnet: INT8 quantization-aware training of mobile
CNNs from scratch with the StatAssist + GradBoost recipe, across four task
workloads (classification, detection, segmentation, style transfer).

Designed TPU-first: functional models (flax), quantization as explicit pytree
state fused into conv epilogues by XLA, GradBoost as optax gradient
transforms, data parallelism via jax.sharding over a device mesh.
"""

__version__ = "0.1.0"

from . import quant

__all__ = ["quant", "__version__"]

# Submodules (nn, models, optim, parallel, data, train, segmentation,
# detection, gan, ops, utils) import lazily — `import frostnet_tpu.models`
# etc. — to keep bare `import frostnet_tpu` light.
