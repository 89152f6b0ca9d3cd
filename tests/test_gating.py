"""Gating math unit tests: noisy-VMoE semantics vs an independent torch oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from m3vit_tpu.moe.gating import (
    cv_squared,
    gates_to_load,
    moe_aux_loss,
    noisy_vmoe_gate,
    prob_in_top_k,
)


def _torch_gate_eval(x, w, top_k):
    """Independent torch implementation of the eval-mode (no-noise) gate:
    softmax over logits, then top-(k+1); scores = raw top-k probs."""
    logits = torch.from_numpy(x) @ torch.from_numpy(w)
    probs = torch.softmax(logits, dim=1)
    m = min(top_k + 1, w.shape[1])
    top_logits, top_indices = probs.topk(m, dim=1)
    gates = torch.zeros_like(probs).scatter(
        1, top_indices[:, :top_k], top_logits[:, :top_k]
    )
    return (
        top_indices[:, :top_k].numpy(),
        top_logits[:, :top_k].numpy(),
        top_logits.numpy(),
        gates.numpy(),
    )


def test_gate_eval_matches_torch_oracle():
    rng = np.random.RandomState(0)
    T, d, E, K = 64, 32, 16, 4
    x = rng.randn(T, d).astype(np.float32)
    w = rng.randn(d, E).astype(np.float32) * 0.1

    out = noisy_vmoe_gate(
        jnp.asarray(x), jnp.asarray(w), top_k=K, noise_std=1.0, train=False
    )
    ref_idx, ref_gates, ref_top, ref_dense = _torch_gate_eval(x, w, K)

    np.testing.assert_array_equal(np.asarray(out.top_k_indices), ref_idx)
    np.testing.assert_allclose(np.asarray(out.top_k_gates), ref_gates, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out.top_logits), ref_top, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out.gates), ref_dense, atol=1e-6)
    # scores are raw softmax probs: each row sums to < 1 (not renormalized)
    assert float(np.asarray(out.top_k_gates).sum(1).max()) < 1.0
    assert float(np.asarray(out.noise_stddev)) == 0.0


def test_gate_train_noise_scale():
    T, d, E, K = 512, 16, 8, 2
    x = jnp.ones((T, d))
    w = jnp.zeros((d, E))
    out = noisy_vmoe_gate(
        x, w, top_k=K, noise_std=1.0, train=True, rng=jax.random.key(0)
    )
    # clean logits all zero -> noisy logits are pure noise with std 1/E
    assert float(out.noise_stddev) == pytest.approx(1.0 / E)
    measured = float(jnp.std(out.noisy_logits))
    assert measured == pytest.approx(1.0 / E, rel=0.1)
    # no_noise kills it
    out2 = noisy_vmoe_gate(
        x, w, top_k=K, noise_std=1.0, train=True, rng=jax.random.key(0), no_noise=True
    )
    assert float(jnp.std(out2.noisy_logits)) == 0.0


def test_cv_squared_matches_torch():
    x = np.array([1.0, 2.0, 3.0, 10.0], np.float32)
    tx = torch.from_numpy(x)
    expected = float(tx.var() / (tx.mean() ** 2 + 1e-10))
    got = float(cv_squared(jnp.asarray(x)))
    assert got == pytest.approx(expected, rel=1e-6)
    assert float(cv_squared(jnp.asarray([5.0]))) == 0.0


def test_prob_in_top_k_matches_torch_oracle():
    """Check against a literal torch transcription of the published
    noisy-top-k load estimator (Shazeer et al. 2017)."""
    rng = np.random.RandomState(1)
    T, E, K = 32, 16, 4
    clean = rng.randn(T, E).astype(np.float32)
    noisy = clean + rng.randn(T, E).astype(np.float32) * 0.1
    top_vals = np.sort(noisy, axis=1)[:, ::-1][:, : K + 1].copy()
    std = 0.0625

    got = np.asarray(
        prob_in_top_k(
            jnp.asarray(clean), jnp.asarray(noisy), jnp.asarray(std),
            jnp.asarray(top_vals), K,
        )
    )

    c, n, tv = map(torch.from_numpy, (clean, noisy, top_vals))
    thr_in = tv[:, K].unsqueeze(1)
    thr_out = tv[:, K - 1].unsqueeze(1)
    normal = torch.distributions.Normal(0.0, 1.0)
    p_in = normal.cdf((c - thr_in) / std)
    p_out = normal.cdf((c - thr_out) / std)
    expected = torch.where(n > thr_in, p_in, p_out).numpy()
    np.testing.assert_allclose(got, expected, atol=1e-5)


def test_moe_aux_loss_eval_is_zero_train_positive():
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(128, 16).astype(np.float32))
    w = jnp.asarray(rng.randn(16, 8).astype(np.float32))
    g_eval = noisy_vmoe_gate(x, w, top_k=2, noise_std=1.0, train=False)
    assert float(moe_aux_loss(g_eval, 2, 8, train=False)) == 0.0
    g_tr = noisy_vmoe_gate(
        x, w, top_k=2, noise_std=1.0, train=True, rng=jax.random.key(3)
    )
    val = float(moe_aux_loss(g_tr, 2, 8, train=True))
    assert np.isfinite(val) and val > 0.0


def test_gates_to_load():
    g = jnp.asarray([[0.5, 0.0, 0.2], [0.0, 0.0, 0.9]])
    np.testing.assert_array_equal(np.asarray(gates_to_load(g)), [1.0, 0.0, 2.0])


def test_noisy_gate_learned_noise():
    """NoisyGate (moe_gate_type='noisy'): topk of raw logits, scores softmax
    over the top-k logits (renormalized), learned per-element noise."""
    from m3vit_tpu.moe.gating import moe_aux_loss_noisy, noisy_gate

    rng = np.random.RandomState(3)
    T, d, E, K = 64, 16, 8, 2
    x = jnp.asarray(rng.randn(T, d).astype(np.float32))
    w_gate = jnp.asarray(rng.randn(d, E).astype(np.float32) * 0.1)
    w_noise = jnp.asarray(rng.randn(d, E).astype(np.float32) * 0.1)

    g = noisy_gate(x, w_gate, w_noise, top_k=K, train=False)
    # scores renormalized: each row sums to exactly 1
    np.testing.assert_allclose(np.asarray(g.top_k_gates).sum(1), 1.0,
                               atol=1e-5)
    # eval mode: routing = topk of clean logits
    expected_idx = np.asarray(jnp.argsort(-x @ w_gate, axis=1)[:, :K])
    np.testing.assert_array_equal(np.sort(np.asarray(g.top_k_indices), 1),
                                  np.sort(expected_idx, 1))
    # train: per-element stddev = softplus(x @ w_noise) + eps
    gt = noisy_gate(x, w_gate, w_noise, top_k=K, train=True,
                    rng=jax.random.key(0))
    std = np.asarray(gt.noise_stddev)
    assert std.shape == (T, E)
    np.testing.assert_allclose(
        std, np.log1p(np.exp(np.asarray(x @ w_noise))) + 1e-2, rtol=1e-4
    )
    loss = float(moe_aux_loss_noisy(gt, K, E, True))
    assert np.isfinite(loss) and loss > 0


def test_backbone_with_noisy_gate_type():
    from m3vit_tpu.models.vit_moe import VisionTransformerMoE

    model = VisionTransformerMoE(
        img_size=(64, 64), patch_size=16, embed_dim=64, depth=2, num_heads=4,
        moe_mlp_ratio=1.0, moe_experts=8, moe_top_k=2, multi_gate=True,
        num_tasks=2, capacity_factor=8.0, dtype=jnp.float32,
        use_checkpointing=False, moe_gate_type="noisy",
    )
    x = jnp.ones((1, 64, 64, 3))
    v = model.init(
        {"params": jax.random.key(0), "gate_noise": jax.random.key(1)},
        x, task_id=jnp.asarray(0), train=True,
    )
    assert "w_noise" in v["params"]["block_1"]["mlp"]
    out, cv, _ = model.apply(
        v, x, task_id=jnp.asarray(0), train=True,
        rngs={"gate_noise": jax.random.key(2)},
    )
    assert np.isfinite(np.asarray(out)).all() and float(cv) > 0


def test_small_topk_matches_lax_top_k():
    """small_topk (rank/one-hot selection, scatter-free VJP) must bit-match
    jax.lax.top_k on values, indices (tie-break toward lower index), and the
    gradient of the selected values."""
    from m3vit_tpu.moe.gating import small_topk

    rng = np.random.RandomState(0)
    for trial in range(10):
        T, E = rng.randint(1, 40), rng.randint(2, 33)
        m = rng.randint(1, E + 1)
        x = rng.rand(T, E).astype(np.float32)
        if trial % 2 == 0:
            x = (x * 4).round() / 4  # force ties
        v0, i0 = jax.lax.top_k(jnp.asarray(x), m)
        v1, i1 = small_topk(jnp.asarray(x), m)
        np.testing.assert_array_equal(np.asarray(v0), np.asarray(v1))
        np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))
    x = jnp.asarray(rng.rand(7, 16).astype(np.float32))
    g0 = jax.grad(lambda x: (jax.lax.top_k(x, 5)[0] ** 2).sum())(x)
    g1 = jax.grad(lambda x: (small_topk(x, 5)[0] ** 2).sum())(x)
    np.testing.assert_allclose(np.asarray(g0), np.asarray(g1), atol=1e-6)
