"""Latent reference capabilities: fake atoms, receptor-ligand hinge loss,
sharded (data-parallel) sampling for eval fan-out."""
import pytest
import numpy as np
import jax
import jax.numpy as jnp

from kpdiff_tpu.models.complex import synthetic_batch
from kpdiff_tpu.models.diffusion import DiffusionConfig, KeypointDiffusion, remove_fake_atoms
@pytest.mark.slow


def test_fake_atoms_loss_and_removal():
    # fake atoms: extra feature channel; x-loss restricted to real atoms
    # (reference dataset.py:89-116, ligand_diffuser.py:159-167,540-597)
    model = KeypointDiffusion(DiffusionConfig(
        atom_nf=11,  # 10 elements + fake channel
        rec_nf=10, n_timesteps=10, rec_encoder_type="fixed", use_fake_atoms=True,
        dynamics=dict(n_layers=1, hidden_nf=16, use_tanh=True, message_norm=1, kl_k=3),
    ))
    cpx = synthetic_batch(0, batch=2, n_rec_pad=20, n_lig_pad=10, n_rec_feat=10, n_lig_feat=11, n_kp=20, kp_feat_dim=10)
    # mark 2 atoms of graph 0 as fake
    lig_h = np.array(cpx.lig_h)  # writable copy
    lig_h[0, 3:5, :] = 0
    lig_h[0, 3:5, -1] = 1
    cpx = cpx.replace(lig_h=jnp.asarray(lig_h))
    params = model.init(jax.random.key(0), cpx)
    losses = model.loss(params, jax.random.key(1), cpx)
    assert np.isfinite(float(losses["l2"]))

    # removal: mask drops argmax==fake-channel atoms
    h = jnp.asarray(lig_h)
    mask = remove_fake_atoms(h, cpx.lig_mask)
    assert not bool(mask[0, 3]) and not bool(mask[0, 4])
    assert bool(mask[0, 0])
@pytest.mark.slow


def test_rl_hinge_loss():
    # receptor-ligand clash hinge (ligand_diffuser.py:45-49,138-156)
    # large threshold so the denoised ligand always clashes -> hinge active
    model = KeypointDiffusion(DiffusionConfig(
        atom_nf=10, rec_nf=10, n_timesteps=10, rec_encoder_type="fixed", rl_dist_threshold=6.0,
        dynamics=dict(n_layers=1, hidden_nf=16, use_tanh=True, message_norm=1, kl_k=3),
    ))
    cpx = synthetic_batch(1, batch=2, n_rec_pad=20, n_lig_pad=8, n_kp=20, kp_feat_dim=10)
    params = model.init(jax.random.key(0), cpx)
    losses = model.loss(params, jax.random.key(1), cpx)
    assert "rl_hinge" in losses
    assert np.isfinite(float(losses["rl_hinge"]))
    assert float(losses["rl_hinge"]) > 0
    # gradient flows through the hinge
    g = jax.grad(lambda p: model.loss(p, jax.random.key(1), cpx)["rl_hinge"])(params)
    assert any(float(jnp.abs(x).max()) > 0 for x in jax.tree_util.tree_leaves(g))
@pytest.mark.slow


def test_sharded_sampling_matches_single_device():
    """Eval fan-out: batch dim sharded over the 'data' mesh (replaces the
    reference's SLURM array scale-out, SURVEY.md §2.4)."""
    from kpdiff_tpu.parallel.mesh import batch_sharding, make_mesh, replicated, shard_batch_pytree

    assert jax.device_count() >= 8
    model = KeypointDiffusion(DiffusionConfig(
        atom_nf=10, rec_nf=10, n_timesteps=8, rec_encoder_type="fixed",
        dynamics=dict(n_layers=1, hidden_nf=16, use_tanh=True, message_norm=1, kl_k=3),
    ))
    cpx = synthetic_batch(2, batch=8, n_rec_pad=16, n_lig_pad=8, n_kp=16, kp_feat_dim=10, min_rec=10)
    params = model.init(jax.random.key(0), cpx)

    def run(params, rng, cpx):
        enc, kk = model.encode(params, cpx)
        out = model.sample(params, rng, enc, kk)
        return out["lig_x"], out["lig_h"]

    x1, h1 = jax.jit(run)(params, jax.random.key(1), cpx)

    mesh = make_mesh(8)
    rep, data = replicated(mesh), batch_sharding(mesh)
    run_dp = jax.jit(run, in_shardings=(rep, rep, data), out_shardings=(data, data))
    cpx_sh = shard_batch_pytree(cpx, mesh)
    x2, h2 = run_dp(params, jax.random.key(1), cpx_sh)

    np.testing.assert_allclose(np.asarray(x2), np.asarray(x1), rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(h2), np.asarray(h1), rtol=2e-3, atol=2e-3)


@pytest.mark.slow
def test_sample_cli_multi_device(tmp_path):
    """--n_devices shards each pocket's replicate batch over the data mesh
    end-to-end through the CLI."""
    import yaml
    from tests.test_cli import TINY_CONFIG
    from kpdiff_tpu.cli.train import main as train_main
    from kpdiff_tpu.cli.sample import main as sample_main

    cfg = dict(TINY_CONFIG)
    cfg["experiment"] = {"name": "mdv", "results_dir": str(tmp_path)}
    cfg_path = tmp_path / "mdv.yml"
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)
    run_dir, _ = train_main(["--config", str(cfg_path), "--synthetic", "8", "--n_devices", "1"])

    out = tmp_path / "sampled"
    sample_main([
        "--model_dir", str(run_dir), "--synthetic", "1", "--samples_per_pocket", "4",
        "--max_batch_size", "4", "--max_tries", "1", "--out", str(out), "--n_devices", "4",
    ])
    assert (out / "pocket_0" / "raw_ligands.sdf").exists()

    # keypoint-axis latency mode through the same CLI (parallel/kp_shard.py)
    out_kp = tmp_path / "sampled_kp"
    sample_main([
        "--model_dir", str(run_dir), "--synthetic", "1", "--samples_per_pocket", "4",
        "--max_batch_size", "4", "--max_tries", "1", "--out", str(out_kp),
        "--n_devices", "8", "--shard_mode", "kp",
    ])
    assert (out_kp / "pocket_0" / "raw_ligands.sdf").exists()


@pytest.mark.slow
def test_train_cli_dp_x_mp(tmp_path):
    """--mp_devices trains on a dp x mp mesh end-to-end through the CLI
    (batch on 'data', keypoint axis on 'model')."""
    import yaml
    from tests.test_cli import TINY_CONFIG
    from kpdiff_tpu.cli.train import main as train_main

    cfg = dict(TINY_CONFIG)
    cfg["experiment"] = {"name": "dpxmp", "results_dir": str(tmp_path)}
    cfg_path = tmp_path / "dpxmp.yml"
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)
    run_dir, state = train_main(["--config", str(cfg_path), "--synthetic", "8",
                                 "--n_devices", "8", "--mp_devices", "2"])
    assert int(state.step) > 0
    import numpy as np
    for leaf in __import__("jax").tree_util.tree_leaves(state.params):
        assert np.all(np.isfinite(np.asarray(leaf)))


def test_kpdiff_platform_env_forces_cpu():
    """KPDIFF_PLATFORM=cpu (+ KPDIFF_CPU_DEVICES) must win over the
    container's TPU-registering sitecustomize in every CLI entry point
    (utils/cache.enable_persistent_cache). Subprocess: conftest's own
    platform forcing must not mask the hook."""
    import os
    import subprocess
    import sys

    env = {k: v for k, v in os.environ.items() if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    env["KPDIFF_PLATFORM"] = "cpu"
    env["KPDIFF_CPU_DEVICES"] = "3"
    out = subprocess.run(
        [sys.executable, "-c",
         "from kpdiff_tpu.utils.cache import enable_persistent_cache;"
         "enable_persistent_cache();"
         "import jax;"
         "print(jax.devices()[0].platform, jax.device_count())"],
        env=env, capture_output=True, text=True, timeout=120,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert out.stdout.strip().split()[-2:] == ["cpu", "3"], out.stdout
