"""Keypoint-axis model-parallel sampling (parallel/kp_shard.py).

Checks, on the 8-device virtual CPU mesh:
  * sharded sampling matches the replicated run (the only difference is
    collective reduction order, so tolerances are tight);
  * the compiled HLO really row-shards the kk pair tensors (K/8 rows per
    device) — i.e. GSPMD did not silently all-gather and replicate;
  * masked kp-row padding (K not a multiple of the mesh axis) is exact;
  * the block kk layout is rejected with the compact_kk hint.

Fast-gate tests run depth-shrunk models (the sharding behavior is
per-layer and depth-independent); the slow-marked tests repeat the
numerics check on the full flagship/GVP configs.
"""
import re

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from kpdiff_tpu.config import PaddingConfig, load_config, model_from_config
from kpdiff_tpu.models.complex import synthetic_batch
from kpdiff_tpu.parallel.kp_shard import pad_kp, shard_encoded

SMALL = {"dynamics.n_layers": 2, "rec_encoder.n_convs": 2}


def _mesh(n=8):
    return Mesh(np.array(jax.devices()[:n]).reshape(n), ("model",))


def _build(config_name, n_timesteps=6, overrides=None):
    cfg = load_config(f"configs/{config_name}.yml")
    cfg["diffusion"]["n_timesteps"] = n_timesteps
    for path, v in (overrides or {}).items():
        sec, key = path.split(".")
        cfg[sec][key] = v
    model = model_from_config(cfg)
    pad = PaddingConfig.from_config(cfg)
    return model, cfg, pad


def _encode(model, pad, batch=2, n_lig=16, min_rec=40, kp_vec_dim=None):
    cpx = synthetic_batch(
        0, batch=batch, n_rec_pad=pad.n_rec, n_lig_pad=n_lig, n_rec_feat=10,
        n_lig_feat=10, n_kp=pad.n_kp, kp_feat_dim=model.cfg.rec_nf,
        kp_vec_dim=kp_vec_dim, n_ip_pad=pad.n_ip, min_rec=min_rec,
        min_lig=min(12, n_lig - 2), min_sep=1.8,
    )
    params = model.init(jax.random.key(0), cpx)
    enc, kk = jax.jit(model.encode)(params, cpx)
    return params, enc, kk


def _sample(model):
    return jax.jit(lambda p, r, e, k: model.sample(p, r, e, k))


def _assert_close(out1, out0, rel=2e-4):
    lig0 = np.asarray(out0["lig_x"])
    scale = float(np.abs(lig0).max())
    assert np.abs(np.asarray(out1["lig_x"]) - lig0).max() < rel * scale + 1e-3


def test_kp_sharded_sample_matches_and_shards_pair_grid():
    """Flagship-shaped (learned encoder, dense kk, K=40): numerics + HLO proof."""
    model, cfg, pad = _build("egnn_40kp", overrides=SMALL)
    params, enc, kk = _encode(model, pad, min_rec=60)
    K = enc.kp_x.shape[1]
    assert K == 40 and K % 8 == 0

    f = _sample(model)
    out0 = f(params, jax.random.key(1), enc, kk)
    lig0, h0 = np.asarray(out0["lig_x"]), np.asarray(out0["lig_h"])

    mesh = _mesh()
    enc_s, kk_s, params_s = shard_encoded(enc, kk, mesh, params=params)
    compiled = f.lower(params_s, jax.random.key(1), enc_s, kk_s).compile()
    txt = compiled.as_text()
    # the kk pair tensors must be row-sharded: 5 = 40/8 keypoint rows per
    # device against the full K=40 second axis, at pair-feature width
    b = enc.kp_x.shape[0]
    assert re.search(rf"\[{b},{K // 8},{K},\d+\]", txt), "kk pair grid not row-sharded"
    # and the full (B, K, K, H) pair grid must NOT appear as a per-device buffer
    assert not re.search(rf"(bf16|f32)\[{b},{K},{K},\d+\]", txt), \
        "found a replicated kk pair grid in the sharded program"

    out1 = compiled(params_s, jax.random.key(1), enc_s, kk_s)
    scale = np.abs(lig0).max()
    assert np.abs(np.asarray(out1["lig_x"]) - lig0).max() < 2e-4 * scale + 1e-3
    assert np.abs(np.asarray(out1["lig_h"]) - h0).max() < 2e-4 * np.abs(h0).max() + 1e-3


def test_kp_padding_is_exact_and_unsharded_matches():
    """K=20 does not divide 8: masked-row padding must be exact (replicated
    run, no collectives involved — padding alone is the variable)."""
    model, cfg, pad = _build("egnn_20kp", overrides=SMALL)
    params, enc, kk = _encode(model, pad, min_rec=60)
    assert enc.kp_x.shape[1] == 20

    f = _sample(model)
    out0 = f(params, jax.random.key(1), enc, kk)

    enc_p, kk_p = pad_kp(enc, kk, 8)
    assert enc_p.kp_x.shape[1] == 24 and kk_p.shape[1:] == (24, 24)
    assert not bool(enc_p.kp_mask[:, 20:].any())
    out1 = f(params, jax.random.key(1), enc_p, kk_p)
    np.testing.assert_allclose(np.asarray(out1["lig_x"]), np.asarray(out0["lig_x"]),
                               rtol=0, atol=1e-5)

    # and the sharded run on the padded set stays close
    mesh = _mesh()
    enc_s, kk_s, params_s = shard_encoded(enc, kk, mesh, params=params)
    out2 = f(params_s, jax.random.key(1), enc_s, kk_s)
    _assert_close(out2, out0)


def test_kp_sharded_fixed_encoder_nbr_list():
    """Fixed encoder (kp = pocket atoms) + compact_kk capped neighbor list:
    the trained-deployment layout of the heavy ca/all_atom variants."""
    model, cfg, pad = _build("egnn_ca", overrides={"padding.n_rec": 64, **SMALL})
    params, enc, kk_raw = _encode(model, pad, min_rec=48, n_lig=16)
    kk = model.compact_kk(enc, kk_raw)
    assert isinstance(kk, tuple), "expected a capped neighbor list at rr=3.5"

    f = _sample(model)
    out0 = f(params, jax.random.key(1), enc, kk)

    mesh = _mesh()
    enc_s, kk_s, params_s = shard_encoded(enc, kk, mesh, params=params)
    out1 = f(params_s, jax.random.key(1), enc_s, kk_s)
    _assert_close(out1, out0)


def test_block_layout_rejected_with_hint():
    model, cfg, pad = _build("egnn_all_atom", overrides={"padding.n_rec": 64, **SMALL})
    params, enc, kk = _encode(model, pad, min_rec=48, n_lig=16)
    assert isinstance(kk, dict)
    with pytest.raises(ValueError, match="compact_kk"):
        shard_encoded(enc, kk, _mesh())


@pytest.mark.slow
def test_kp_sharded_sample_full_flagship():
    """Full egnn_40kp config (6 layers, width 257, bf16 pair MLPs)."""
    model, cfg, pad = _build("egnn_40kp")
    params, enc, kk = _encode(model, pad, min_rec=60)
    f = _sample(model)
    out0 = f(params, jax.random.key(1), enc, kk)
    enc_s, kk_s, params_s = shard_encoded(enc, kk, _mesh(), params=params)
    out1 = f(params_s, jax.random.key(1), enc_s, kk_s)
    _assert_close(out1, out0)


@pytest.mark.slow
def test_kp_sharded_sample_gvp():
    """GVP family: kp_v (B, K, V, 3) vector channels shard too."""
    model, cfg, pad = _build("gvp_40kp")
    kpv = cfg.get("dynamics_gvp", {}).get("vector_size", 16)
    params, enc, kk = _encode(model, pad, min_rec=60, kp_vec_dim=kpv)
    f = _sample(model)
    out0 = f(params, jax.random.key(1), enc, kk)
    enc_s, kk_s, params_s = shard_encoded(enc, kk, _mesh(), params=params)
    out1 = f(params_s, jax.random.key(1), enc_s, kk_s)
    _assert_close(out1, out0, rel=5e-4)


def test_pad_kp_nbr_tuple_rows():
    """pad_kp on a capped neighbor list: appended rows are masked-off and
    existing indices are untouched (they keep referring to unmoved rows)."""
    import jax.numpy as jnp
    from kpdiff_tpu.models.complex import PaddedComplex

    B, K, C = 2, 20, 6
    enc = PaddedComplex(
        rec_x=jnp.zeros((B, 4, 3)), rec_h=jnp.zeros((B, 4, 5)),
        rec_mask=jnp.ones((B, 4), bool), rec_res_idx=jnp.zeros((B, 4), jnp.int32),
        lig_x=jnp.zeros((B, 8, 3)), lig_h=jnp.zeros((B, 8, 5)),
        lig_mask=jnp.ones((B, 8), bool),
        kp_x=jnp.ones((B, K, 3)), kp_h=jnp.ones((B, K, 7)),
        kp_mask=jnp.ones((B, K), bool),
    )
    idx = jnp.tile(jnp.arange(C, dtype=jnp.int32), (B, K, 1))
    mask = jnp.ones((B, K, C), bool)
    enc_p, (idx_p, mask_p) = pad_kp(enc, (idx, mask), 8)
    assert enc_p.kp_x.shape[1] == 24 and idx_p.shape == (B, 24, C)
    assert not bool(mask_p[:, K:].any()) and not bool(enc_p.kp_mask[:, K:].any())
    np.testing.assert_array_equal(np.asarray(idx_p[:, :K]), np.asarray(idx))
    assert bool(mask_p[:, :K].all())
