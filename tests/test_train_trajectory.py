"""N-step training-TRAJECTORY parity vs the reference's own train loop.

Chain parity (tests/test_reference_chain.py) pins one forward; these tests
pin the OPTIMIZER trajectory: ~8 steps of the reference's exact recipe —
torch.optim.Adam(lr, weight_decay) over the reference's own
KeypointDiffusion (executed through tests/refexec.py), loss =
l2 + w_rec * rec_encoder, clip_grad_value_(1.5) (reference
train.py:430-433,520-543) — against our jitted train step
(training/trainer.py::make_train_step with the with_t_eps seam) from the
same converted initial weights on identical data and injected noise/t.

What this covers that chain parity can't: gradients THROUGH the executed
modules (the OT plan detach, rec_encoder_loss.py:11-18; the executed
rec→kp attention; the dead-branch kk coord updates), torch-Adam vs
optax-adam semantics (bias correction, eps placement, coupled weight
decay BEFORE the moments), and the clip→decay→adam ordering. Asserted:
per-step l2/rec_encoder losses and the end-of-trajectory parameter
DELTAS (final - initial) for every converted tensor.
"""
import copy
import tempfile

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from kpdiff_tpu.models.diffusion import DiffusionConfig, KeypointDiffusion
from kpdiff_tpu.training.scheduler import SchedulerConfig
from kpdiff_tpu.training.trainer import (
    TrainConfig,
    TrainState,
    make_optimizer,
    make_train_step,
)
from kpdiff_tpu.utils.torch_import import convert_reference_checkpoint

from tests.parity_jax import _chain_complex
from tests.test_reference_chain import (
    ATOM_NF,
    HID,
    N_KP,
    T,
    _RandnQueue,
    _build_reference_model,
    _dyn_cfg,
    _enc_cfg_ours,
    _enc_cfg_ref,
    _flat_rows,
    _graph_cutoffs,
    _gvp_dyn_cfg,
    _gvp_enc_cfg_ours,
    _gvp_enc_cfg_ref,
    _patched_torch_rng,
    _pocket_graph,
)
from tests.refexec import dgl_batch

N_STEPS = 8
LR = 1e-4
WD = 1e-12
CLIP = 1.5
W_REC = 0.1
N_PAD = 8


def _make_data(rng, arch):
    """Two fixed micro-batches (B=2 complexes each), cycled over the
    trajectory, as (torch arrays per complex, padded numpy batch)."""
    batches = []
    for b in range(2):
        n_recs = [12, 10] if b == 0 else [11, 12]
        n_ligs = [6, 7] if b == 0 else [7, 5]
        per_complex = []
        rec_xp = np.zeros((2, max(n_recs), 3), np.float32)
        rec_hp = np.zeros((2, max(n_recs), ATOM_NF), np.float32)
        rec_mask = np.zeros((2, max(n_recs)), bool)
        lig_xp = np.zeros((2, N_PAD, 3), np.float32)
        lig_hp = np.zeros((2, N_PAD, ATOM_NF), np.float32)
        lig_mask = np.zeros((2, N_PAD), bool)
        for i, (n_rec, n_lig) in enumerate(zip(n_recs, n_ligs)):
            rec_x = rng.normal(size=(n_rec, 3)).astype(np.float32) * 2.5
            rec_h = rng.normal(size=(n_rec, ATOM_NF)).astype(np.float32)
            lig_x = rng.normal(size=(n_lig, 3)).astype(np.float32)
            lig_h = rng.normal(size=(n_lig, ATOM_NF)).astype(np.float32)
            per_complex.append((rec_x, rec_h, lig_x, lig_h))
            rec_xp[i, :n_rec], rec_hp[i, :n_rec], rec_mask[i, :n_rec] = rec_x, rec_h, True
            lig_xp[i, :n_lig], lig_hp[i, :n_lig], lig_mask[i, :n_lig] = lig_x, lig_h, True
        inputs = dict(rec_x=rec_xp, rec_h=rec_hp, rec_mask=rec_mask,
                      lig_x=lig_xp, lig_h=lig_hp, lig_mask=lig_mask)
        batches.append((per_complex, inputs, n_ligs))
    return batches


def _ref_graphs(per_complex):
    """Fresh shim graphs each step: the reference forward mutates edge sets
    and node data in place (ligand_diffuser.py:95,387-441)."""
    graphs = []
    for rec_x, rec_h, lig_x, lig_h in per_complex:
        graphs.append(_pocket_graph(
            torch.tensor(rec_x), torch.tensor(rec_h), n_kp=N_KP,
            lig_x=torch.tensor(lig_x), lig_h=torch.tensor(lig_h)))
    return dgl_batch(graphs)


def _run_trajectory(arch):
    rng = np.random.default_rng(17)
    batches = _make_data(rng, arch)

    # per-step injected noise/timesteps
    t_steps = rng.integers(0, T, size=(N_STEPS, 2))
    eps_x_steps = rng.normal(size=(N_STEPS, 2, N_PAD, 3)).astype(np.float32)
    eps_h_steps = rng.normal(size=(N_STEPS, 2, N_PAD, ATOM_NF)).astype(np.float32)

    # ---------------- reference side: the train.py:520-543 recipe ----------
    with tempfile.TemporaryDirectory() as td:
        if arch == "egnn":
            ref = _build_reference_model(
                td, "learned", HID, rec_encoder_config=_enc_cfg_ref(),
                rec_encoder_loss_config={"loss_type": "optimal_transport"})
        else:
            ref = _build_reference_model(
                td, "learned", GVP_OUT,
                rec_encoder_config=_gvp_enc_cfg_ref(),
                rec_encoder_loss_config={"loss_type": "optimal_transport"},
                architecture="gvp",
                dynamics_config=dict(_gvp_dyn_cfg(), n_keypoints=N_KP))

    init_sd = {k: v.detach().clone().numpy() for k, v in ref.state_dict().items()}
    opt = torch.optim.Adam(ref.parameters(), lr=LR, weight_decay=WD)

    ref_losses = []
    for s in range(N_STEPS):
        per_complex, _, n_ligs = batches[s % 2]
        gb = _ref_graphs(per_complex)
        q = _RandnQueue()
        q.t_ints = t_steps[s]
        # reference draw order: eps['h'] FIRST (ligand_diffuser.py:125-128)
        q.push(_flat_rows(eps_h_steps[s], n_ligs))
        q.push(_flat_rows(eps_x_steps[s], n_ligs))
        opt.zero_grad()
        with _patched_torch_rng(q):
            losses = ref(gb, interface_points=None)
        assert len(q.q) == 0
        total = losses["l2"] + W_REC * losses["rec_encoder"]
        total.backward()
        torch.nn.utils.clip_grad_value_(ref.parameters(), clip_value=CLIP)
        opt.step()
        ref_losses.append({k: float(v) for k, v in losses.items()})
    final_sd = {k: v.detach().clone().numpy() for k, v in ref.state_dict().items()}

    # ---------------- our side: the real trainer step ----------------------
    if arch == "egnn":
        config = dict(
            atom_nf=ATOM_NF, rec_nf=HID, n_timesteps=T, precision=1e-4,
            rec_encoder_type="learned", graph_cutoffs=_graph_cutoffs(),
            dynamics=_dyn_cfg(), rec_encoder=_enc_cfg_ours(),
            rec_encoder_loss={"loss_type": "optimal_transport", "method": "exact"},
        )
        meta = dict(n_kp=N_KP, kp_feat_dim=HID)
    else:
        config = dict(
            atom_nf=ATOM_NF, rec_nf=GVP_OUT, n_timesteps=T, precision=1e-4,
            architecture="gvp", rec_encoder_type="learned",
            graph_cutoffs=_graph_cutoffs(),
            dynamics=_gvp_dyn_cfg(), rec_encoder=_gvp_enc_cfg_ours(),
            rec_encoder_loss={"loss_type": "optimal_transport", "method": "exact"},
        )
        meta = dict(n_kp=N_KP, kp_feat_dim=GVP_OUT, kp_vec_dim=GVP_V)
    model = KeypointDiffusion(DiffusionConfig(**config))

    params0 = convert_reference_checkpoint(init_sd, model)
    tcfg = TrainConfig(
        learning_rate=LR, weight_decay=WD, clip_grad=True, clip_value=CLIP,
        rec_encoder_loss_weight=W_REC,
        scheduler=SchedulerConfig(base_lr=LR, warmup_length=0.0,
                                  rec_enc_loss_weight=W_REC,
                                  rec_enc_weight_decay_midpoint=0.0),
    )
    optimizer = make_optimizer(tcfg)
    state = TrainState(params=params0, opt_state=optimizer.init(params0),
                       step=jnp.zeros((), jnp.int32))
    step_fn = make_train_step(model, tcfg, optimizer, iters_per_epoch=1000,
                              with_t_eps=True)

    cpxs = [
        _chain_complex(meta, inputs, model.cfg) for _, inputs, _ in batches
    ]
    our_losses = []
    for s in range(N_STEPS):
        t_eps = (jnp.asarray(t_steps[s].astype(np.int32)),
                 jnp.asarray(eps_x_steps[s]), jnp.asarray(eps_h_steps[s]))
        state, metrics = step_fn(state, jax.random.key(0), (cpxs[s % 2], t_eps))
        our_losses.append({k: float(metrics[k]) for k in ("l2", "rec_encoder")})
        assert float(metrics["skipped_nonfinite"]) == 0.0

    # ---------------- asserts ----------------------------------------------
    for s in range(N_STEPS):
        for k in ("l2", "rec_encoder"):
            np.testing.assert_allclose(
                our_losses[s][k], ref_losses[s][k], rtol=3e-3, atol=3e-5,
                err_msg=f"{arch} step {s} loss {k}: trajectories diverged")

    ref_final = convert_reference_checkpoint(final_sd, model)
    flat_ours = jax.tree_util.tree_leaves_with_path(state.params)
    flat_init = dict(jax.tree_util.tree_leaves_with_path(params0))
    flat_ref = dict(jax.tree_util.tree_leaves_with_path(ref_final))
    n_changed = 0
    for path, ours in flat_ours:
        ref_v = np.asarray(flat_ref[path])
        init_v = np.asarray(flat_init[path])
        d_ours = np.asarray(ours) - init_v
        d_ref = ref_v - init_v
        name = jax.tree_util.keystr(path)
        if np.abs(d_ref).max() > 0:
            n_changed += 1
        # Adam-normalized updates are O(lr)=1e-4 per step; after 8 steps a
        # delta-scale atol of ~2% of one step's update catches any real
        # optimizer-semantics divergence without tripping on f32 noise
        np.testing.assert_allclose(
            d_ours, d_ref, rtol=5e-2, atol=2.5e-6,
            err_msg=f"{arch} param delta diverged: {name}")
    assert n_changed > 0, "reference optimizer moved no converted parameter"
    return ref_losses, our_losses


GVP_OUT = 10  # GVP encoder out_scalar_size (matches _gvp_enc_cfg_* )
GVP_V = 3


@pytest.mark.slow
def test_train_trajectory_parity_egnn():
    ref_losses, our_losses = _run_trajectory("egnn")
    # the trajectory must actually evolve (losses change step to step)
    assert ref_losses[0]["l2"] != ref_losses[-1]["l2"]


@pytest.mark.slow
def test_train_trajectory_parity_gvp():
    _run_trajectory("gvp")
