"""Worker for the two-process multi-host smoke test (SURVEY §5.8).

Run as:  python tests/multihost_worker.py <nproc> <pid> <out.json>

With nproc=2 each process owns 2 CPU devices and joins a localhost
`jax.distributed.initialize` rendezvous; with nproc=1 it runs the same
step single-process over 4 local devices. Both paths drive the REAL
production code: `global_data_mesh` + `make_train_step(mesh=...)` with
the batch turned into a global array via
`jax.make_array_from_process_local_data` on each process's batch rows
(`process_local_batch_slice`). Process 0 writes {"l2", "checksum"} so
the test can assert the two-process run reproduces the single-process
numbers.

NOTE: this container's sitecustomize force-registers the axon TPU
backend and eats JAX_PLATFORMS; the CPU platform must be configured via
jax.config BEFORE any device query or distributed init.
"""
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))  # repo root

COORD = "127.0.0.1:29731"


def main():
    nproc, pid, out_path = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 4 // nproc)
    if nproc > 1:
        from kpdiff_tpu.parallel.distributed import initialize_multihost

        initialize_multihost(coordinator_address=COORD, num_processes=nproc, process_id=pid)
    assert jax.device_count() == 4, jax.device_count()

    import numpy as np

    from kpdiff_tpu.models.complex import synthetic_batch
    from kpdiff_tpu.models.diffusion import DiffusionConfig, KeypointDiffusion
    from kpdiff_tpu.parallel.distributed import global_data_mesh, process_local_batch_slice
    from kpdiff_tpu.parallel.mesh import batch_sharding, replicated
    from kpdiff_tpu.training.scheduler import SchedulerConfig
    from kpdiff_tpu.training.trainer import TrainConfig, init_train_state, make_optimizer, make_train_step

    model = KeypointDiffusion(DiffusionConfig(
        atom_nf=10, rec_nf=10, n_timesteps=50, rec_encoder_type="fixed",
        dynamics=dict(n_layers=1, hidden_nf=16, use_tanh=True, message_norm=1, norm=True, kl_k=3),
    ))
    batch = synthetic_batch(5, batch=8, n_rec_pad=24, n_lig_pad=10, n_kp=24, kp_feat_dim=10)

    tcfg = TrainConfig(learning_rate=1e-3, batch_size=8, scheduler=SchedulerConfig(base_lr=1e-3))
    opt = make_optimizer(tcfg)
    # identical seeds on every process -> identical host-local state
    state = init_train_state(model, opt, jax.random.key(0), batch)

    mesh = global_data_mesh()
    rep, data = replicated(mesh), batch_sharding(mesh)

    def to_global(tree, sharding, rows=None):
        def put(x):
            if x is None:
                return None
            x = np.asarray(x)
            if rows is not None:
                return jax.make_array_from_process_local_data(sharding, x[rows])
            return jax.make_array_from_process_local_data(sharding, x, x.shape)
        return jax.tree_util.tree_map(put, tree)

    state = to_global(state, rep)
    gbatch = to_global(batch, data, rows=process_local_batch_slice(8))
    # legacy uint32 key so the key crosses the make_array boundary; the
    # production step splits it with jax.random.* which accepts both forms
    key = to_global(np.asarray(jax.random.PRNGKey(7)), rep)

    step = make_train_step(model, tcfg, opt, iters_per_epoch=2, mesh=mesh)
    new_state, metrics = step(state, key, gbatch)

    l2 = float(np.asarray(jax.device_get(metrics["l2"])))
    checksum = float(sum(
        float(np.abs(np.asarray(jax.device_get(leaf))).sum())
        for leaf in jax.tree_util.tree_leaves(new_state.params)
    ))
    if pid == 0:
        with open(out_path, "w") as f:
            json.dump({"l2": l2, "checksum": checksum}, f)
    print(f"proc {pid}/{nproc}: l2={l2:.6f} checksum={checksum:.4f}", flush=True)


if __name__ == "__main__":
    main()
