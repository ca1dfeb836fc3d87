"""ModelAnalyzer + pocket-file writer tests."""
import pytest
import numpy as np
import jax

from kpdiff_tpu.analysis.analyzer import ModelAnalyzer
from kpdiff_tpu.config import PaddingConfig
from kpdiff_tpu.data.dataset import synthetic_dataset
from kpdiff_tpu.models.diffusion import DiffusionConfig, KeypointDiffusion
@pytest.mark.slow


def test_model_analyzer_runs():
    cfg = DiffusionConfig(
        atom_nf=10, rec_nf=10, n_timesteps=5, precision=1e-5, rec_encoder_type="fixed",
        dynamics=dict(n_layers=1, hidden_nf=16, use_tanh=True, message_norm=1, kl_k=3),
    )
    model = KeypointDiffusion(cfg)
    ds = synthetic_dataset(6, seed=0, rec_range=(16, 30), lig_range=(6, 10))
    pad = PaddingConfig(n_rec=32, n_lig=12, n_kp=32, n_ip=8)

    from kpdiff_tpu.models.complex import synthetic_batch

    cpx = synthetic_batch(0, batch=2, n_rec_pad=32, n_lig_pad=12, n_kp=32, kp_feat_dim=10)
    params = model.init(jax.random.key(0), cpx)

    analyzer = ModelAnalyzer(model, ds, pad, lig_elements=list("CNOSPFXYZB"), n_receptors=2, n_replicates=2)
    metrics = analyzer.sample_and_analyze(params, jax.random.key(1))
    assert "validity" in metrics
    assert metrics["n_sampled"] == 4
    assert metrics["sec_per_mol"] > 0


def test_model_analyzer_chunked_launches():
    """diff_batch_size chunks the sampler launches (the heavy GVP variants
    cannot hold all n_receptors*n_replicates molecules in one launch on a
    16G chip); chunk size 3 over 2x2=4 items exercises the repeat-pad +
    discard path and must still analyze exactly n_items molecules."""
    cfg = DiffusionConfig(
        atom_nf=10, rec_nf=10, n_timesteps=5, precision=1e-5, rec_encoder_type="fixed",
        dynamics=dict(n_layers=1, hidden_nf=16, use_tanh=True, message_norm=1, kl_k=3),
    )
    model = KeypointDiffusion(cfg)
    ds = synthetic_dataset(6, seed=0, rec_range=(16, 30), lig_range=(6, 10))
    pad = PaddingConfig(n_rec=32, n_lig=12, n_kp=32, n_ip=8)

    from kpdiff_tpu.models.complex import synthetic_batch

    cpx = synthetic_batch(0, batch=2, n_rec_pad=32, n_lig_pad=12, n_kp=32, kp_feat_dim=10)
    params = model.init(jax.random.key(0), cpx)

    analyzer = ModelAnalyzer(model, ds, pad, lig_elements=list("CNOSPFXYZB"),
                             n_receptors=2, n_replicates=2, diff_batch_size=3)
    metrics = analyzer.sample_and_analyze(params, jax.random.key(1))
    assert "validity" in metrics
    assert metrics["n_sampled"] == 4


def test_write_pocket_file(tmp_path):
    from kpdiff_tpu.data.pdb import format_pdb_line, parse_pdb
    from kpdiff_tpu.data.pocketfile import write_pocket_file

    rng = np.random.default_rng(0)
    lines = []
    serial = 1
    for res in range(6):
        base = np.array([res * 20.0, 0, 0])  # residues 0.. spaced 20A apart
        for name, el in [("N", "N"), ("CA", "C")]:
            x, y, z = base + rng.normal(scale=0.3, size=3)
            lines.append(format_pdb_line(serial, name, "GLY", "A", res + 1, x, y, z, el))
            serial += 1
    p = tmp_path / "rec.pdb"
    p.write_text("\n".join(lines) + "\nEND\n")

    lig = np.array([[0.0, 2.0, 0.0]])  # near residue 0 only
    out = tmp_path / "pocket.pdb"
    pocket = write_pocket_file(p, lig, out, cutoff=8.0)
    assert len(pocket) == 2  # only residue 1's atoms
    reparsed = parse_pdb(out)
    assert len(reparsed) == 2
