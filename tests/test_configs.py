"""Every shipped config (mirroring all 8 reference trained models + dev)
must construct, initialize, and run one loss + a short sample."""
from pathlib import Path

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import kpdiff_tpu
from kpdiff_tpu.config import PaddingConfig, load_config, model_from_config, resolve_feature_sizes
from kpdiff_tpu.models.complex import synthetic_batch

CONFIG_DIR = Path(__file__).parent.parent / "configs"
ALL_CONFIGS = sorted(p.name for p in CONFIG_DIR.glob("*.yml"))


def test_all_reference_variants_covered():
    expected = {
        "egnn_ca.yml", "gvp_ca.yml", "egnn_20kp.yml", "egnn_40kp.yml",
        "gvp_20kp.yml", "gvp_40kp.yml", "egnn_all_atom.yml", "gvp_all_atom.yml",
        "dev_config.yml",
    }
    assert expected.issubset(set(ALL_CONFIGS)), set(ALL_CONFIGS)


@pytest.mark.slow
@pytest.mark.parametrize("name", ALL_CONFIGS)
def test_config_builds_and_runs(name):
    cfg = load_config(CONFIG_DIR / name)
    # shrink for test speed: tiny shapes, short diffusion, thin layers
    cfg["padding"] = {"n_rec": 24, "n_lig": 10, "n_ip": 8}
    cfg["graph"]["n_keypoints"] = min(cfg["graph"].get("n_keypoints", 20), 6)
    cfg["diffusion"]["n_timesteps"] = 5
    if "dynamics" in cfg:
        cfg["dynamics"]["n_layers"] = 1
        cfg["dynamics"]["hidden_nf"] = 16
    if "dynamics_gvp" in cfg:
        cfg["dynamics_gvp"].update(n_convs=2, n_hidden_scalars=16, vector_size=4,
                                   n_message_gvps=1, n_update_gvps=1, n_noise_gvps=2)
    if "rec_encoder" in cfg:
        cfg["rec_encoder"].update(n_convs=1, hidden_n_node_feat=16, out_n_node_feat=16)
    if "rec_encoder_gvp" in cfg:
        cfg["rec_encoder_gvp"].update(n_rr_convs=1, n_rk_convs=1, out_scalar_size=16,
                                      vector_size=4, n_message_gvps=1, n_update_gvps=1)

    model = model_from_config(cfg)
    pad = PaddingConfig.from_config(cfg)
    n_rec_feat, n_lig_feat, n_kp_feat = resolve_feature_sizes(cfg)

    kp_vec = None
    if model.cfg.architecture == "gvp":
        kp_vec = model.cfg.rec_encoder.get("vector_size", 16)

    cpx = synthetic_batch(
        0, batch=2, n_rec_pad=pad.n_rec, n_lig_pad=pad.n_lig,
        n_rec_feat=n_rec_feat, n_lig_feat=n_lig_feat,
        n_kp=pad.n_kp, kp_feat_dim=n_kp_feat, kp_vec_dim=kp_vec,
        n_ip_pad=pad.n_ip, min_rec=12, min_lig=6,
    )
    params = model.init(jax.random.key(0), cpx)
    losses = model.loss(params, jax.random.key(1), cpx)
    for k, v in losses.items():
        assert np.isfinite(float(v)), (name, k)

    enc, kk = model.encode(params, cpx)
    out = model.sample(params, jax.random.key(2), enc, kk)
    assert np.all(np.isfinite(np.asarray(out["lig_x"]))), name
