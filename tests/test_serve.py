"""Serving API: load a trained run once, sample pockets programmatically."""
import pytest
import numpy as np
import yaml

from tests.test_cli import TINY_CONFIG, _write_synthetic_complex_pdb_sdf


@pytest.mark.slow
def test_keypoint_sampler(tmp_path):
    from kpdiff_tpu.cli.train import main as train_main
    from kpdiff_tpu.serve import KeypointSampler

    cfg = dict(TINY_CONFIG)
    cfg["experiment"] = {"name": "serve", "results_dir": str(tmp_path)}
    cfg_path = tmp_path / "cfg.yml"
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)
    run_dir, _ = train_main(["--config", str(cfg_path), "--synthetic", "8", "--n_devices", "1"])

    sampler = KeypointSampler(run_dir, batch_size=4, seed=0)

    pdb_path, sdf_path = _write_synthetic_complex_pdb_sdf(tmp_path)
    mols = sampler.sample_for_pocket(pdb_path, sdf_path, n_mols=4, ligand_size="ref")
    assert isinstance(mols, list)
    for m in mols:
        assert m.n_atoms >= 1
        assert np.all(np.isfinite(m.coords))

    # array-level entry (no files)
    rng = np.random.default_rng(0)
    rec_pos = rng.normal(size=(24, 3)).astype(np.float32) * 4
    rec_feat = np.zeros((24, 10), np.float32)
    rec_feat[np.arange(24), rng.integers(0, 10, 24)] = 1
    mols2 = sampler.sample_for_arrays(rec_pos, rec_feat, n_mols=4, ligand_size=6)
    assert isinstance(mols2, list)

    # ligand-size buckets engage in serving: a 6-atom request is padded to
    # the smallest bucket (8), not the full capacity (16)
    assert sampler.lig_buckets == [8, 16]
    seen = []
    inner = sampler._run

    def spy(params, rng_, cpx, com):
        seen.append(cpx.lig_x.shape[1])
        return inner(params, rng_, cpx, com)

    sampler._run = spy
    sampler.sample_for_arrays(rec_pos, rec_feat, n_mols=2, ligand_size=6)
    sampler.sample_for_arrays(rec_pos, rec_feat, n_mols=2, ligand_size=12)
    assert seen == [8, 16]
    sampler._run = inner

    # latency mode: keypoint-axis model parallelism over the 8-device mesh
    # (parallel/kp_shard.py) — same pipeline, kp-sharded reverse diffusion
    sampler_kp = KeypointSampler(run_dir, batch_size=4, seed=0, kp_shard_devices=8)
    assert sampler_kp._mesh is not None
    mols3 = sampler_kp.sample_for_arrays(rec_pos, rec_feat, n_mols=4, ligand_size=6)
    assert isinstance(mols3, list)
    for m in mols3:
        assert np.all(np.isfinite(m.coords))
