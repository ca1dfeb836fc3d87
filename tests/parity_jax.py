"""Torch-free JAX side of the parity checks — shared by the live torch
parity tests and the golden-fixture tests (tests/test_golden_parity.py).

A "case" is a dict of numpy arrays plus a JSON meta blob:
  kind:     'egnn_dynamics' | 'egnn_encoder' | 'gvp_dynamics' | 'gvp_encoder'
  meta:     model-config kwargs + scalars (t_val, tolerances)
  params/*: converted parameter pytree (flattened with '/'-joined paths)
  in/*:     inputs
  exp/*:    expected outputs (from the torch reference implementation)
"""
from __future__ import annotations

import json

import numpy as np
import jax
import jax.numpy as jnp

from kpdiff_tpu.models.complex import synthetic_batch
from kpdiff_tpu.models.diffusion import DiffusionConfig, KeypointDiffusion
from kpdiff_tpu.ops.neighbors import dense_radius_adjacency


def flatten_case(kind, meta, params, inputs, expected):
    """-> dict[str, np.ndarray] + stores meta as a JSON scalar array."""
    out = {"kind": np.array(kind), "meta": np.array(json.dumps(meta))}
    leaves = jax.tree_util.tree_flatten_with_path(params)[0]
    for path, leaf in leaves:
        key = "/".join(str(getattr(p, "key", p)) for p in path)
        out[f"params/{key}"] = np.asarray(leaf)
    for k, v in inputs.items():
        out[f"in/{k}"] = np.asarray(v)
    for k, v in expected.items():
        out[f"exp/{k}"] = np.asarray(v)
    return out


def unflatten_case(npz):
    meta = json.loads(str(npz["meta"]))
    params = {}
    inputs, expected = {}, {}
    for k in npz.files:
        if k.startswith("params/"):
            node = params
            parts = k[len("params/"):].split("/")
            for p in parts[:-1]:
                node = node.setdefault(p, {})
            node[parts[-1]] = jnp.asarray(npz[k])
        elif k.startswith("in/"):
            inputs[k[3:]] = npz[k]
        elif k.startswith("exp/"):
            expected[k[4:]] = npz[k]
    return str(npz["kind"]), meta, params, inputs, expected


def _chain_complex(meta, inputs, cfg):
    """PaddedComplex for the chain_* cases; ligand arrays default to zeros
    (sampling overwrites them with the injected noise)."""
    from kpdiff_tpu.models.complex import make_complex

    lig_mask = inputs["lig_mask"].astype(bool)
    b, n_pad = lig_mask.shape
    lig_x = inputs.get("lig_x", np.zeros((b, n_pad, 3), np.float32))
    lig_h = inputs.get("lig_h", np.zeros((b, n_pad, cfg.atom_nf), np.float32))
    return make_complex(
        inputs["rec_x"], inputs["rec_h"], inputs["rec_mask"].astype(bool),
        lig_x, lig_h, lig_mask,
        n_kp=meta["n_kp"], kp_feat_dim=meta["kp_feat_dim"],
        kp_vec_dim=meta.get("kp_vec_dim"),
        ip_x=inputs.get("ip_x"),
        ip_mask=inputs["ip_mask"].astype(bool) if "ip_mask" in inputs else None,
    )


def run_case(kind, meta, params, inputs):
    """Run the kpdiff_tpu side of a parity case; returns dict of outputs."""
    cfg = DiffusionConfig(**{k: (v if not isinstance(v, dict) else dict(v))
                             for k, v in meta["config"].items()})
    model = KeypointDiffusion(cfg)

    if kind in ("egnn_dynamics", "gvp_dynamics"):
        lig_x = jnp.asarray(inputs["lig_x"])[None]
        lig_h = jnp.asarray(inputs["lig_h"])[None]
        kp_x = jnp.asarray(inputs["kp_x"])[None]
        kp_h = jnp.asarray(inputs["kp_h"])[None]
        lig_mask = jnp.ones((1, lig_x.shape[1]), bool)
        kp_mask = jnp.ones((1, kp_x.shape[1]), bool)
        kk = dense_radius_adjacency(kp_x, kp_mask, kp_x, kp_mask,
                                    meta["kk_cut"], exclude_self=True)
        kp_v = jnp.asarray(inputs["kp_v"])[None] if "kp_v" in inputs else None
        eps_h, eps_x = model._apply_dynamics(
            {"dynamics": params}, lig_x, lig_h, lig_mask, kp_x, kp_h, kp_mask,
            jnp.full((1,), meta["t_val"]), kk, kp_v,
        )
        return {"eps_h": np.asarray(eps_h)[0], "eps_x": np.asarray(eps_x)[0]}

    if kind == "chain_sample":
        # whole sampling chain: encode -> T ancestral steps on injected noise
        # (the torch-free replay of tests/test_reference_chain.py cases)
        cpx = _chain_complex(meta, inputs, cfg)
        enc, kk = model.encode(params, cpx)
        noise = {k: jnp.asarray(inputs[k])
                 for k in ("init_x", "init_h", "steps_x", "steps_h")}
        init_com = jnp.asarray(inputs["init_com"]) if "init_com" in inputs else None
        out = model.sample(params, jax.random.key(0), enc, kk,
                           init_com=init_com, noise=noise,
                           return_every=meta.get("return_every", 0))
        res = {"lig_x": np.asarray(out["lig_x"]), "lig_h": np.asarray(out["lig_h"])}
        if meta.get("return_every"):
            res["frames_x"] = np.asarray(out["frames_x"])
            res["frames_h"] = np.asarray(out["frames_h"])
        return res

    if kind == "chain_loss":
        cpx = _chain_complex(meta, inputs, cfg)
        losses = model.loss(
            params, jax.random.key(0), cpx,
            t_eps_override=(jnp.asarray(inputs["t_ints"].astype(np.int32)),
                            jnp.asarray(inputs["eps_x"]),
                            jnp.asarray(inputs["eps_h"])))
        return {k: np.asarray(v) for k, v in losses.items()}

    if kind in ("egnn_encoder", "gvp_encoder"):
        x0 = inputs["rec_x"]
        n = x0.shape[0]
        kp_vec_dim = meta.get("kp_vec_dim")
        cpx = synthetic_batch(0, batch=1, n_rec_pad=n, n_lig_pad=6,
                              n_rec_feat=inputs["rec_h"].shape[1], n_lig_feat=5,
                              n_kp=meta["n_kp"], kp_feat_dim=meta["kp_feat_dim"],
                              kp_vec_dim=kp_vec_dim, min_rec=n, min_lig=6)
        cpx = cpx.replace(rec_x=jnp.asarray(x0)[None], rec_h=jnp.asarray(inputs["rec_h"])[None])
        if "rec_res_idx" in inputs:
            cpx = cpx.replace(rec_res_idx=jnp.asarray(inputs["rec_res_idx"].astype(np.int32))[None])
        enc, _ = model.encode({"encoder": params}, cpx)
        out = {"kp_x": np.asarray(enc.kp_x)[0], "kp_h": np.asarray(enc.kp_h)[0]}
        if enc.kp_v is not None:
            out["kp_v"] = np.asarray(enc.kp_v)[0]
        return out

    raise ValueError(kind)


def assert_case(npz, default_rtol=5e-4, default_atol=1e-4):
    kind, meta, params, inputs, expected = unflatten_case(npz)
    got = run_case(kind, meta, params, inputs)
    rtol = meta.get("rtol", default_rtol)
    atol = meta.get("atol", default_atol)
    for k, v in expected.items():
        np.testing.assert_allclose(got[k], v, rtol=rtol, atol=atol, err_msg=f"{kind}:{k}")
