"""scripts/scaling_analysis.py — HLO collective-traffic accounting.

The end-to-end path (compile the dp-8 step, parse its SPMD HLO) is exercised
manually (results recorded in docs/PARALLELISM.md); compiling the flagship
step just for a parser test would add minutes to the suite. These tests pin
the parsing/accounting logic on representative HLO text instead.
"""
import importlib.util
import os
import sys

import pytest

_SPEC = importlib.util.spec_from_file_location(
    "scaling_analysis",
    os.path.join(os.path.dirname(__file__), "..", "scripts",
                 "scaling_analysis.py"))


@pytest.fixture(scope="module")
def sa():
    mod = importlib.util.module_from_spec(_SPEC)
    _SPEC.loader.exec_module(mod)
    return mod


HLO = """\
HloModule jit_step, entry_computation_layout={...}

%fused_computation (param_0: f32[1280]) -> f32[1280] {
  ROOT %add = f32[1280]{0} add(...)
}

ENTRY %main.123 {
  %ar0 = f32[13982]{0} all-reduce(f32[13982]{0} %grad), replica_groups={{0,1,2,3,4,5,6,7}}, to_apply=%add
  %ar1 = (f32[100]{0}, bf16[200]{0}) all-reduce(%a, %b), to_apply=%add
  %ag = f32[8,32]{1,0} all-gather(f32[1,32]{1,0} %x), dimensions={0}
  %cp = u8[16]{0} collective-permute(u8[16]{0} %y), source_target_pairs={{0,1}}
  %ars = f32[64]{0} all-reduce-start(f32[64]{0} %z), to_apply=%add
  %not_a_collective = f32[4]{0} add(f32[4]{0} %p, f32[4]{0} %q), metadata={op_name="all-reduce-lookalike"}
}
"""


def test_collective_bytes_counts_and_sums(sa):
    stats = sa.collective_bytes(HLO)
    # ar0: 13982*4; ar1 tuple: 100*4 + 200*2; ars (async start): 64*4
    assert stats["all-reduce"]["count"] == 3
    assert stats["all-reduce"]["bytes"] == 13982 * 4 + 100 * 4 + 200 * 2 + 64 * 4
    assert stats["all-gather"] == {"count": 1, "bytes": 8 * 32 * 4}
    assert stats["collective-permute"] == {"count": 1, "bytes": 16}
    assert stats["all-to-all"] == {"count": 0, "bytes": 0}


def test_metadata_lookalike_not_counted(sa):
    # the op_name string mentions "all-reduce" but the opcode is `add`
    stats = sa.collective_bytes(
        '%x = f32[4]{0} add(%p, %q), metadata={op_name="all-reduce"}\n')
    assert stats["all-reduce"]["count"] == 0


def test_shape_bytes_dtypes(sa):
    assert sa._shape_bytes("f32", "2,3") == 24
    assert sa._shape_bytes("bf16", "8") == 16
    assert sa._shape_bytes("pred", "") == 1
    assert sa._shape_bytes("token", "") == 0  # opaque types ignored
