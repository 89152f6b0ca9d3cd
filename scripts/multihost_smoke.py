"""Multi-process `jax.distributed` smoke: one train step over a mesh that
spans two OS processes.

This is the TPU-native equivalent of the reference's torchrun/slurm NCCL
process-group bring-up (reference train_fastmoe.py:268-312): each process
contributes its local devices, `jax.distributed.initialize` forms the global
backend (DCN in a real pod; localhost gRPC here), and one (data, expert)
mesh spans all of them.  Run by tests/test_multihost.py with 2 CPU processes
of 4 virtual devices each; the same code path is what `--multihost` enables
in m3vit_tpu.cli.train.

Everything device-resident is created INSIDE jit with explicit out_shardings,
so no host value ever needs cross-process placement: the idiomatic multihost
JAX pattern (each process executes the same program; GSPMD owns placement).

Usage: python scripts/multihost_smoke.py <process_id> <num_processes> <port>
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    local_devices = 4
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={local_devices}"
    ).strip()

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=nproc,
        process_id=pid,
    )
    assert jax.process_count() == nproc, jax.process_count()
    n_global = nproc * local_devices
    assert len(jax.devices()) == n_global, len(jax.devices())
    assert len(jax.local_devices()) == local_devices

    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from __graft_entry__ import build_flagship
    from m3vit_tpu.data.synthetic import synthetic_batch
    from m3vit_tpu.losses.functions import loss_fn_for_task
    from m3vit_tpu.parallel.mesh import (
        EXPERT_PARAM_NAMES,
        batch_sharding,
        make_mesh,
    )
    from m3vit_tpu.train.optim import build_optimizer
    from m3vit_tpu.train.state import create_train_state
    from m3vit_tpu.train.step import make_train_step

    mesh = make_mesh(nproc, local_devices)  # 'data' across processes (DCN),
    # 'expert' within each process (ICI on a real pod slice)
    model, tasks = build_flagship(
        img=32, embed=32, depth=2, heads=2, experts=8, top_k=2,
        mesh=mesh, expert_axis="expert", dtype=jnp.float32,
        capacity_factor=4.0, use_checkpointing=False, use_pallas_ffn=False,
    )
    B = n_global * 2
    p = {
        "optimizer": "sgd",
        "optimizer_kwargs": {"lr": 0.01, "momentum": 0.9, "weight_decay": 1e-4},
        "scheduler": "poly",
        "epochs": 2,
    }
    tx = build_optimizer(p, steps_per_epoch=2)

    def make_batch(key):
        return synthetic_batch(key, tasks, B, (32, 32))

    bsh = batch_sharding(mesh)
    batch = jax.jit(make_batch, out_shardings=bsh)(jax.random.key(0))

    def make_state():
        return create_train_state(model, jax.random.key(1), batch, tx)

    def leaf_sharding(path, leaf):
        expert = any(
            getattr(e, "key", None) in EXPERT_PARAM_NAMES for e in path
        )
        return NamedSharding(mesh, P("expert") if expert else P())

    abs_state = jax.eval_shape(make_state)
    state_sh = jax.tree_util.tree_map_with_path(leaf_sharding, abs_state)
    state = jax.jit(make_state, out_shardings=state_sh)()

    loss_fns = {t.name: loss_fn_for_task(t.name, {"edge_w": 0.95})
                for t in tasks}
    weights = {"semseg": 1.0, "human_parts": 2.0, "sal": 5.0, "edge": 50.0,
               "normals": 10.0}
    step = make_train_step(model, [t.name for t in tasks], loss_fns, weights)
    state, metrics = step(state, batch, jax.random.key(2))

    w1 = state.params["backbone"]["block_1"]["mlp"]["experts_w1"]
    assert "expert" in str(w1.sharding.spec), w1.sharding
    loss = metrics["loss_total"]
    assert loss.sharding.is_fully_replicated, loss.sharding
    total = float(np.asarray(loss.addressable_data(0)))
    assert np.isfinite(total), total
    print(f"[proc {pid}/{nproc}] multihost smoke ok: loss={total:.4f}, "
          f"mesh={dict(mesh.shape)}, devices={n_global}", flush=True)


if __name__ == "__main__":
    main()
