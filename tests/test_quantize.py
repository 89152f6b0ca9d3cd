"""Weight-only int8 expert quantization (serving path).

Covers: quantize/dequantize numerics, the MoEFfnParamsQ dispatch path
(XLA dequant and the Pallas q-kernel in interpret mode), and an
end-to-end model conversion: a float backbone's forward vs the
`expert_weights_int8=True` model on the quantized tree.
"""

import jax
import jax.numpy as jnp
import numpy as np

from m3vit_tpu.moe.dispatch import (
    MoEFfnParams,
    MoEFfnParamsQ,
    dequantize_ffn_params,
    expert_ffn_dense,
    moe_ffn,
)
from m3vit_tpu.serve.quantize import (
    dequantize_weight,
    expert_quantization_error,
    quantize_expert_tree,
    quantize_weight,
)


def _grid_weights(rng, shape, scale=0.01):
    """Weights exactly representable in int8 x per-channel scale: every
    output channel (last axis) carries a +-127 entry so quantize_weight
    recovers `scale` (to 1 ulp) and the roundtrip is exact."""
    q = rng.integers(-126, 127, size=shape).astype(np.float32)
    q[:, 0, :] = 127.0
    return q * scale


def test_quantize_roundtrip_exact_on_grid():
    rng = np.random.default_rng(0)
    w = _grid_weights(rng, (3, 16, 8))
    # force at least one +-127 per output channel so the scale is exact
    w[:, 0, :] = 127 * 0.01
    q, s = quantize_weight(jnp.asarray(w))
    deq = np.asarray(dequantize_weight(q, s))
    np.testing.assert_allclose(deq, w, rtol=0, atol=1e-6)


def test_quantization_error_bounded():
    rng = np.random.default_rng(1)
    w = jnp.asarray(rng.normal(size=(4, 32, 16)).astype(np.float32))
    q, s = quantize_weight(w)
    deq = np.asarray(dequantize_weight(q, s))
    # symmetric per-channel: error <= scale/2 per element
    bound = np.asarray(s)[:, None, :] / 2 + 1e-7
    assert (np.abs(deq - np.asarray(w)) <= bound).all()


def _qparams(rng, E, d, h):
    w1 = jnp.asarray(_grid_weights(rng, (E, d, h)))
    w2 = jnp.asarray(_grid_weights(rng, (E, h, d)))
    b1 = jnp.asarray(rng.normal(size=(E, h)).astype(np.float32) * 0.01)
    b2 = jnp.asarray(rng.normal(size=(E, d)).astype(np.float32) * 0.01)
    fp = MoEFfnParams(w1=w1, b1=b1, w2=w2, b2=b2)
    q1, s1 = quantize_weight(w1)
    q2, s2 = quantize_weight(w2)
    qp = MoEFfnParamsQ(w1=q1, b1=b1, w2=q2, b2=b2, s1=s1, s2=s2)
    return fp, qp


def test_expert_ffn_dense_quantized_matches_float():
    rng = np.random.default_rng(2)
    E, C, d, h = 4, 16, 32, 24
    fp, qp = _qparams(rng, E, d, h)
    x = jnp.asarray(rng.normal(size=(E, C, d)).astype(np.float32))
    a = np.asarray(expert_ffn_dense(x, fp, compute_dtype=jnp.float32))
    b = np.asarray(expert_ffn_dense(x, qp, compute_dtype=jnp.float32))
    np.testing.assert_allclose(b, a, rtol=1e-4,
                               atol=1e-4 * np.abs(a).max())


def test_pallas_q_kernel_matches_dequant(monkeypatch):
    from m3vit_tpu.ops.expert_ffn import quantized_expert_ffn

    rng = np.random.default_rng(3)
    E, C, d, h = 2, 256, 128, 128   # kernel-tileable shapes
    fp, qp = _qparams(rng, E, d, h)
    x = jnp.asarray(rng.normal(size=(E, C, d)).astype(np.float32)).astype(
        jnp.bfloat16)
    ref = np.asarray(expert_ffn_dense(
        x, dequantize_ffn_params(qp, jnp.bfloat16),
        compute_dtype=jnp.bfloat16), np.float32)
    out = np.asarray(quantized_expert_ffn(x, qp, interpret=True), np.float32)
    # bf16 compute + A-S erf-approx gelu vs exact: ~1% of output scale
    np.testing.assert_allclose(out, ref, atol=0.02 * np.abs(ref).max())


def test_moe_ffn_quantized_path():
    rng = np.random.default_rng(4)
    E, d, h, T, K = 4, 32, 24, 40, 2
    fp, qp = _qparams(rng, E, d, h)
    x = jnp.asarray(rng.normal(size=(T, d)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, E, size=(T, K)).astype(np.int32))
    gates = jax.nn.softmax(
        jnp.asarray(rng.normal(size=(T, K)).astype(np.float32)), -1)
    a = np.asarray(moe_ffn(x, idx, gates, fp, capacity_factor=8.0,
                           compute_dtype=jnp.float32))
    b = np.asarray(moe_ffn(x, idx, gates, qp, capacity_factor=8.0,
                           compute_dtype=jnp.float32))
    np.testing.assert_allclose(b, a, rtol=1e-4,
                               atol=1e-4 * np.abs(a).max())


def test_expert_parallel_quantized(mesh8):
    """int8 expert banks shard over the expert axis exactly like float ones
    (MoEFfnParamsQ param_spec in moe_ffn's shard_map): EP == local."""
    rng = np.random.default_rng(6)
    B, N, d, h, E, K = 8, 16, 32, 24, 8, 2
    fp, qp = _qparams(rng, E, d, h)
    x = jnp.asarray(rng.normal(size=(B, N, d)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, E, size=(B, N, K)).astype(np.int32))
    gates = jnp.asarray(rng.random(size=(B, N, K)).astype(np.float32))

    local = moe_ffn(x, idx, gates, qp, capacity_factor=float(E),
                    compute_dtype=jnp.float32)
    ep = jax.jit(lambda xx: moe_ffn(
        xx, idx, gates, qp,
        mesh=mesh8, expert_axis="expert", batch_axes=("data", "expert"),
        capacity_factor=float(E), compute_dtype=jnp.float32,
    ))(x)
    np.testing.assert_allclose(np.asarray(ep), np.asarray(local), atol=1e-4)


def test_inference_session_with_int8_model():
    """Bucketed AOT serving on a quantized model: session output tracks the
    float session within int8 drift (the serve deployment path)."""
    import dataclasses

    from m3vit_tpu.serve import InferenceSession
    from tests.test_train_step import IMG, build_tiny_model

    model = build_tiny_model()
    variables = model.init(
        {"params": jax.random.key(0)},
        jnp.zeros((1, IMG, IMG, 3), jnp.float32), train=False)
    model_q = dataclasses.replace(
        model,
        backbone=dataclasses.replace(model.backbone,
                                     expert_weights_int8=True))
    vars_q = dict(variables) | {
        "params": quantize_expert_tree(variables["params"])}

    imgs = np.asarray(
        jax.random.normal(jax.random.key(2), (1, IMG, IMG, 3)), np.float32)
    sess = InferenceSession(model, variables, ["semseg"], (IMG, IMG),
                            buckets=(1,))
    sess_q = InferenceSession(model_q, vars_q, ["semseg"], (IMG, IMG),
                              buckets=(1,))
    a = sess.predict(imgs, "semseg")
    b = sess_q.predict(imgs, "semseg")
    rel = np.abs(a - b).max() / (np.abs(a).max() + 1e-9)
    assert rel < 0.05, rel


def test_model_int8_conversion_end_to_end():
    """Float backbone forward vs expert_weights_int8 model on the converted
    tree: identical routing, bounded output drift."""
    from tests.test_models import tiny_moe_backbone

    model = tiny_moe_backbone()
    model_q = tiny_moe_backbone(expert_weights_int8=True)
    x = jax.random.normal(jax.random.key(0), (2, 64, 64, 3), jnp.float32)
    tid = jnp.int32(0)
    variables = model.init(jax.random.key(1), x, tid, train=False)
    out, _, _ = model.apply(variables, x, tid, train=False)

    qparams = quantize_expert_tree(variables["params"])
    err = expert_quantization_error(variables["params"])
    assert 0 < err < 0.01  # grid-free random weights: ~1/254 relative
    out_q, _, _ = model_q.apply({"params": qparams}, x, tid, train=False)

    a, b = np.asarray(out, np.float32), np.asarray(out_q, np.float32)
    rel = np.abs(a - b).max() / (np.abs(a).max() + 1e-9)
    assert rel < 0.05, rel


def test_quantize_stacked_scan_layout_matches_per_layer():
    """scan_blocks stores expert banks as [L, E, d_in, d_out]; quantizing
    the stacked bank must equal quantizing each layer independently (the
    reduction is over d_in, never the leading layer/expert axes)."""
    rng = np.random.default_rng(7)
    w = jnp.asarray(rng.normal(size=(3, 4, 16, 8)).astype(np.float32))
    q, s = quantize_weight(w)
    assert q.shape == (3, 4, 16, 8) and s.shape == (3, 4, 8)
    for layer in range(3):
        ql, sl = quantize_weight(w[layer])
        np.testing.assert_array_equal(np.asarray(q[layer]), np.asarray(ql))
        np.testing.assert_allclose(np.asarray(s[layer]), np.asarray(sl))
    deq = np.asarray(dequantize_weight(q, s))
    np.testing.assert_allclose(
        deq, np.asarray(w), atol=float(np.abs(w).max()) / 127)


def test_quantize_expert_tree_scan_layout():
    """quantize_expert_tree on a blocks_scan-layout tree produces per-layer
    q/scale pairs the scan-mode int8 model consumes (slice of dim 0 ==
    the loop-mode per-block qparams)."""
    from m3vit_tpu.utils.scan_params import loop_to_scan

    rng = np.random.default_rng(8)
    loop_tree = {
        f"block_{i}": {"mlp": {
            "experts_w1": rng.normal(size=(4, 8, 16)).astype(np.float32),
            "experts_b1": np.zeros((4, 16), np.float32),
            "experts_w2": rng.normal(size=(4, 16, 8)).astype(np.float32),
            "experts_b2": np.zeros((4, 8), np.float32),
        }} for i in range(4)
    }
    scan_tree = loop_to_scan(loop_tree, 4)
    q_scan = quantize_expert_tree(scan_tree)
    q_loop = quantize_expert_tree(loop_tree)
    stacked = q_scan["blocks_scan"]["moe"]["mlp"]
    for j, i in enumerate((1, 3)):  # odd blocks are the moe entries
        ref = q_loop[f"block_{i}"]["mlp"]
        np.testing.assert_array_equal(
            np.asarray(stacked["experts_w1_q"][j]),
            np.asarray(ref["experts_w1_q"]))
        np.testing.assert_allclose(
            np.asarray(stacked["experts_w2_scale"][j]),
            np.asarray(ref["experts_w2_scale"]))
