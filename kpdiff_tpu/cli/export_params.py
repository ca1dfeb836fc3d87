"""Export a run's latest orbax checkpoint params to a flat npz archive.

    python -m kpdiff_tpu.cli.export_params RUN_DIR OUT.npz [--step N]

The reference ships trained models as bare torch state_dicts
(utils.py:65-66); our equivalent portable artifact is the compact
flat-npz of `utils/params_io.py` that `bench.py` and the demo docs
consume. Restores the raw orbax pytree on CPU (no need to rebuild the
model/optimizer to get a matching TrainState template) and archives its
`params` subtree.
"""
from __future__ import annotations

import argparse
from pathlib import Path


def latest_step(ckpt_dir: Path) -> int:
    steps = sorted(int(p.name.split("_")[1]) for p in ckpt_dir.glob("step_*"))
    if not steps:
        raise FileNotFoundError(f"no checkpoints under {ckpt_dir}")
    return steps[-1]


def export(run_dir: str | Path, out: str | Path, step: int | None = None) -> int:
    import jax

    jax.config.update("jax_platforms", "cpu")

    import orbax.checkpoint as ocp
    from jax.sharding import SingleDeviceSharding

    from kpdiff_tpu.utils.params_io import save_params_npz

    ckpt_dir = (Path(run_dir) / "checkpoints").absolute()
    step = latest_step(ckpt_dir) if step is None else step
    dev = jax.local_devices()[0]
    with ocp.StandardCheckpointer() as ckptr:
        # Restore device-free: checkpoints written on the TPU carry TPU
        # sharding metadata that a bare restore() tries to re-materialize
        # ("Device TPU v5 lite0 was not found"); build an abstract target
        # from the checkpoint's own tree metadata, pinned to host CPU.
        path = ckpt_dir / f"step_{step}"
        meta = ckptr.metadata(path).item_metadata
        target = jax.tree_util.tree_map(
            lambda m: jax.ShapeDtypeStruct(m.shape, m.dtype, sharding=SingleDeviceSharding(dev)),
            meta.tree,
        )
        tree = ckptr.restore(path, target)
    if not isinstance(tree, dict) or "params" not in tree:
        raise ValueError(f"checkpoint at step {step} has no 'params' subtree "
                         f"(keys: {list(tree) if isinstance(tree, dict) else type(tree)})")
    save_params_npz(tree["params"], out)
    n = sum(int(x.size) for x in jax.tree_util.tree_leaves(tree["params"]))
    print(f"exported step {step}: {n:,} params -> {out}")
    return step


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("run_dir")
    p.add_argument("out")
    p.add_argument("--step", type=int, default=None)
    a = p.parse_args(argv)
    export(a.run_dir, a.out, a.step)


if __name__ == "__main__":
    main()
