"""Numerical parity against the ACTUAL reference implementation.

Imports /root/reference/models/moe/ckpt/noisy_gate_vmoe.py read-only (with a
minimal stub for the fastmoe BaseGate dependency) and compares its outputs
with m3vit_tpu.moe.gating on identical weights/inputs.  Skipped when the
reference tree is not mounted.
"""

import importlib.util
import os
import sys
import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

REF_GATE = "/root/reference/models/moe/ckpt/noisy_gate_vmoe.py"

pytestmark = pytest.mark.skipif(
    not os.path.isfile(REF_GATE), reason="reference tree not mounted"
)


def _load_reference_gate():
    # minimal fmoe stub: BaseGate only holds num_expert/world/tot_expert + loss
    if "fmoe" not in sys.modules:
        fmoe = types.ModuleType("fmoe")
        gates = types.ModuleType("fmoe.gates")
        base = types.ModuleType("fmoe.gates.base_gate")

        class BaseGate(torch.nn.Module):
            def __init__(self, num_expert, world_size):
                super().__init__()
                self.world_size = world_size
                self.num_expert = num_expert
                self.tot_expert = world_size * num_expert
                self.loss = None

            def set_loss(self, loss):
                self.loss = loss

        base.BaseGate = BaseGate
        gates.base_gate = base
        fmoe.gates = gates
        sys.modules["fmoe"] = fmoe
        sys.modules["fmoe.gates"] = gates
        sys.modules["fmoe.gates.base_gate"] = base

    spec = importlib.util.spec_from_file_location("ref_noisy_gate_vmoe",
                                                  REF_GATE)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_gate_matches_reference_implementation():
    """Eval-mode (deterministic) outputs of the reference NoisyGate_VMoE vs
    our noisy_vmoe_gate, same weights, same inputs."""
    from m3vit_tpu.moe.gating import noisy_vmoe_gate

    ref_mod = _load_reference_gate()
    T, d, E, K = 64, 32, 16, 4
    rng = np.random.RandomState(0)
    x = rng.randn(T, d).astype(np.float32)
    w = rng.randn(d, E).astype(np.float32) * 0.1

    gate = ref_mod.NoisyGate_VMoE(d, E, 1, top_k=K, noise_std=1.0)
    gate.eval()
    with torch.no_grad():
        gate.w_gate.copy_(torch.from_numpy(w))
        (ref_idx, ref_scores), ref_clean, ref_noisy, ref_std, ref_top, \
            ref_gates = gate(torch.from_numpy(x))

    ours = noisy_vmoe_gate(jnp.asarray(x), jnp.asarray(w), top_k=K,
                           noise_std=1.0, train=False)

    np.testing.assert_array_equal(np.asarray(ours.top_k_indices),
                                  ref_idx.numpy())
    np.testing.assert_allclose(np.asarray(ours.top_k_gates),
                               ref_scores.numpy(), atol=1e-6)
    np.testing.assert_allclose(np.asarray(ours.clean_logits),
                               ref_clean.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(ours.top_logits),
                               ref_top.numpy(), atol=1e-6)
    np.testing.assert_allclose(np.asarray(ours.gates), ref_gates.numpy(),
                               atol=1e-6)
    assert float(ours.noise_stddev) == float(ref_std)


def test_gate_train_no_noise_matches_reference():
    """training=True but no_noise: both paths stay deterministic and equal
    (covers the reference's noise_stddev *= 0 branch)."""
    from m3vit_tpu.moe.gating import noisy_vmoe_gate

    ref_mod = _load_reference_gate()
    T, d, E, K = 32, 16, 8, 2
    rng = np.random.RandomState(1)
    x = rng.randn(T, d).astype(np.float32)
    w = rng.randn(d, E).astype(np.float32) * 0.2

    gate = ref_mod.NoisyGate_VMoE(d, E, 1, top_k=K, noise_std=1.0,
                                  no_noise=True)
    gate.train()
    with torch.no_grad():
        gate.w_gate.copy_(torch.from_numpy(w))
        (ref_idx, ref_scores), *_ , ref_gates = gate(torch.from_numpy(x))

    ours = noisy_vmoe_gate(jnp.asarray(x), jnp.asarray(w), top_k=K,
                           noise_std=1.0, train=True, no_noise=True,
                           rng=jax.random.key(0))
    np.testing.assert_array_equal(np.asarray(ours.top_k_indices),
                                  ref_idx.numpy())
    np.testing.assert_allclose(np.asarray(ours.gates), ref_gates.numpy(),
                               atol=1e-6)
