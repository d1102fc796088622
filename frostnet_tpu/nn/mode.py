"""Execution mode for quant-aware modules.

The reference mutates its model graph through phases (FP32 warm-up ->
fuse_modules -> prepare_qat -> convert; e.g. Classification/train.py:149-173).
Here the *same* functional model serves every phase; the phase is a value:

  * ``FP32``       — plain float training/eval (StatAssist warm-up phase).
  * ``QAT``        — fake-quant forward, observers updating (train loop).
  * ``QAT_FROZEN`` — fake-quant forward, observers frozen
                     (the ``disable_observer`` helper, Classification/train.py:27-33).
  * ``INT8``       — true integer inference (torch.quantization.convert).

Switching phase is passing a different mode to ``model.apply`` — the pjit'd
step recompiles once per phase, and XLA fuses/folds accordingly.
"""
from __future__ import annotations

import dataclasses


@dataclasses.dataclass(frozen=True)
class QuantMode:
    fake_quant: bool = False  # apply quantize-dequantize in forward
    observe: bool = False     # update observer state (requires mutable 'quant')
    int8: bool = False        # true-integer inference path (freeze/convert)

    def __post_init__(self):
        if self.int8 and (self.fake_quant or self.observe):
            raise ValueError("int8 mode is exclusive")


FP32 = QuantMode()
QAT = QuantMode(fake_quant=True, observe=True)
QAT_FROZEN = QuantMode(fake_quant=True, observe=False)
INT8 = QuantMode(int8=True)
