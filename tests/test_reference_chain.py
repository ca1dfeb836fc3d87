"""Whole-CHAIN parity vs the reference's own KeypointDiffusion module
(models/ligand_diffuser.py), executed through the tests/refexec.py shim.

The module-level refexec tests (tests/test_reference_execution.py) pin the
dynamics/encoders; these tests pin everything AROUND them — the pieces a
correlated misreading could still break while every module test stays green:
COM frame management (remove_com cadence, init frames, final un-framing),
the noising/denoising algebra, the p(z_s|z_t) ancestral update, the
per-step edge-rebuild loop, ragged batching vs our padded masks, and the
loss assembly (l2/pos/feat + OT rec-encoder loss via our own exact EMD
solver backing the `ot` stub).

Mechanism: both sides consume the EXACT same gaussians — torch.randn /
torch.randint are patched to pop from a pre-drawn queue while the
reference runs (ligand_diffuser.py:121-128,366-367,530-531), and our
sampler/loss take the same arrays through the documented injection seams
(`KeypointDiffusion.sample(noise=...)`, `.loss(t_eps_override=...)`).
With identical weights (state_dict -> convert_reference_checkpoint) the
chains must agree to f32 tolerance at every output.

Each scenario is a CASE BUILDER returning the golden-fixture flat format
(tests/parity_jax.flatten_case, kinds 'chain_sample' / 'chain_loss') so the
same cases can be frozen torch-free into tests/golden/refexec_chain_*.npz
(python -m tests.golden.generate) and replayed in the fast gate; the live
tests here rebuild them against the actual reference execution.
"""
import contextlib
import io
import pickle
import tempfile
from pathlib import Path

import numpy as np
import pytest
import torch

import jax

from kpdiff_tpu.models.diffusion import DiffusionConfig, KeypointDiffusion
from kpdiff_tpu.utils.torch_import import convert_reference_checkpoint

from tests.parity_jax import assert_case, flatten_case
from tests.refexec import (
    HeteroGraphShim,
    dgl_batch,
    dgl_unbatch,
    load_reference_module,
    tc_radius_graph,
)

ATOM_NF = 6
HID = 8
T = 8
RR_CUT = 4.0
LL_CUT = 6.0
KL_K = 2
N_KP = 4
K_CLOSEST = 3
SIZES = [6, 7]
N_PAD = 8
N_REC = 12

ETYPES = {
    "rr": ("rec", "rec"),
    "rk": ("rec", "kp"),
    "kk": ("kp", "kp"),
    "kl": ("kp", "lig"),
    "lk": ("lig", "kp"),
    "ll": ("lig", "lig"),
}

GVP_S = 10
GVP_V = 3


# ------------------------------------------------------------------ helpers
class _RandnQueue:
    """Deterministic replacement for torch.randn/randint during the
    reference run: pops pre-drawn arrays, asserting the requested shape."""

    def __init__(self):
        self.q = []
        self.t_ints = None

    def push(self, arr):
        self.q.append(torch.tensor(np.asarray(arr), dtype=torch.float32))

    def randn(self, *size, device=None, dtype=None, **kw):
        if len(size) == 1 and not isinstance(size[0], int):
            size = tuple(size[0])
        t = self.q.pop(0)
        assert tuple(t.shape) == tuple(size), (tuple(t.shape), tuple(size))
        return t

    def randint(self, low, high, size=None, device=None, **kw):
        t = torch.tensor(np.asarray(self.t_ints), dtype=torch.long)
        assert tuple(t.shape) == tuple(size)
        return t


@contextlib.contextmanager
def _patched_torch_rng(q):
    orig_randn, orig_randint = torch.randn, torch.randint
    torch.randn, torch.randint = q.randn, q.randint
    try:
        yield
    finally:
        torch.randn, torch.randint = orig_randn, orig_randint


def _flat_rows(padded, sizes):
    """(B, N, d) padded -> ragged (sum sizes, d) in graph order."""
    return np.concatenate([np.asarray(padded)[i, :n] for i, n in enumerate(sizes)], axis=0)


def _pad_rows(flat_list, n_pad):
    """list of (n_i, d) tensors -> (B, n_pad, d) zero-padded."""
    d = flat_list[0].shape[-1]
    out = np.zeros((len(flat_list), n_pad, d), np.float32)
    for i, t in enumerate(flat_list):
        out[i, : t.shape[0]] = np.asarray(t)
    return out


def _sizedist_dir(tmp_path):
    joint = np.ones((4, 5)) / 20.0
    with open(Path(tmp_path) / "train_n_node_joint_dist.pkl", "wb") as f:
        pickle.dump((joint, (10, 13), (4, 8)), f)
    return Path(tmp_path)


def _pocket_graph(rec_x, rec_h, n_kp, lig_x=None, lig_h=None):
    """A dataset-format complex graph: rr radius edges (cap 100, matching
    the processing pipeline), complete bipartite rk in kp-major order, empty
    kl/lk/ll/kk (the dynamics rebuilds them), optional reference ligand."""
    n_rec = rec_x.shape[0]
    n_lig = 0 if lig_x is None else lig_x.shape[0]
    g = HeteroGraphShim(
        num_nodes={"rec": n_rec, "kp": n_kp, "lig": n_lig}, etypes=ETYPES
    )
    rr = tc_radius_graph(rec_x, RR_CUT, max_num_neighbors=100)
    g.add_edges(rr[0], rr[1], etype="rr")
    n_rk = 0
    if n_kp:
        g.add_edges(
            torch.arange(n_rec).repeat(n_kp),
            torch.arange(n_kp).repeat_interleave(n_rec),
            etype="rk",
        )
        n_rk = n_rec * n_kp
    g.nodes["rec"].data["x_0"] = rec_x
    g.nodes["rec"].data["h_0"] = rec_h
    if lig_x is not None:
        g.nodes["lig"].data["x_0"] = lig_x
        g.nodes["lig"].data["h_0"] = lig_h
    g.set_batch_num_nodes(
        {"rec": torch.tensor([n_rec]), "kp": torch.tensor([n_kp]), "lig": torch.tensor([n_lig])}
    )
    counts = {"rr": rr.shape[1], "rk": n_rk}
    g.set_batch_num_edges(
        {(s, et, d): torch.tensor([counts.get(et, 0)]) for et, (s, d) in ETYPES.items()}
    )
    return g


def _dyn_cfg():
    return dict(
        n_layers=2, hidden_nf=HID, use_tanh=True, message_norm=1,
        update_kp_feat=True, norm=True, ll_k=0, kl_k=KL_K,
    )


def _graph_cutoffs():
    return {"rr": RR_CUT, "rk": 100.0, "kk": 8.0, "kl": 8.0, "ll": LL_CUT}


def _enc_cfg_ref():
    """Reference ReceptorEncoder kwargs (module-level parity settings)."""
    return dict(
        n_convs=2, n_keypoints=N_KP, in_n_node_feat=ATOM_NF,
        use_sameres_feat=False, hidden_n_node_feat=HID, out_n_node_feat=HID,
        use_tanh=True, coords_range=10, kp_feat_scale=1, message_norm=1,
        kp_rad=0.0, k_closest=K_CLOSEST, norm=True, fix_pos=False,
    )


def _enc_cfg_ours():
    return dict(
        n_keypoints=N_KP, in_n_node_feat=ATOM_NF, hidden_n_node_feat=HID,
        out_n_node_feat=HID, n_convs=2, use_tanh=True, message_norm=1,
        k_closest=K_CLOSEST, kp_rad=0.0, norm=True, fix_pos=False,
        use_sameres_feat=False, attn_semantics="executed",
    )


def _gvp_dyn_cfg():
    return dict(
        vector_size=GVP_V, n_convs=2, n_hidden_scalars=12, message_norm=10.0,
        update_kp=True, ll_k=0, kl_k=KL_K, n_message_gvps=2, n_update_gvps=1,
        n_noise_gvps=2,
    )


def _gvp_enc_cfg_ref():
    return dict(
        in_scalar_size=ATOM_NF, out_scalar_size=GVP_S, n_message_gvps=2,
        n_update_gvps=1, vector_size=GVP_V, n_rr_convs=2, n_rk_convs=2,
        message_norm=10.0, use_sameres_feat=False, kp_rad=0,
        k_closest=K_CLOSEST, dropout=0.0, n_keypoints=N_KP,
    )


def _gvp_enc_cfg_ours():
    return dict(
        in_scalar_size=ATOM_NF, n_keypoints=N_KP, out_scalar_size=GVP_S,
        vector_size=GVP_V, n_rr_convs=2, n_rk_convs=2, message_norm=10.0,
        k_closest=K_CLOSEST, kp_rad=0, n_message_gvps=2, n_update_gvps=1,
        dropout=0.0, attn_semantics="executed",
    )


def _build_reference_model(tmp_path, rec_encoder_type, rec_nf,
                           rec_encoder_config=None, rec_encoder_loss_config=None,
                           architecture="egnn", dynamics_config=None):
    ld_mod = load_reference_module("models.ligand_diffuser")
    torch.manual_seed(11)
    model = ld_mod.KeypointDiffusion(
        atom_nf=ATOM_NF, rec_nf=rec_nf,
        processed_dataset_dir=_sizedist_dir(tmp_path),
        n_timesteps=T, architecture=architecture,
        rec_encoder_type=rec_encoder_type,
        graph_config={"graph_cutoffs": _graph_cutoffs()},
        dynamics_config=dynamics_config if dynamics_config is not None
        else dict(_dyn_cfg(), n_keypoints=N_KP),
        rec_encoder_config=dict(rec_encoder_config or {}),
        rec_encoder_loss_config=dict(rec_encoder_loss_config or {}),
        precision=1e-4, lig_feat_norm_constant=1,
    ).eval()
    return model


def _np_params(ref_model, our_model):
    sd = {k: v.detach().numpy() for k, v in ref_model.state_dict().items()}
    return convert_reference_checkpoint(sd, our_model)


def _sampling_noise(rng):
    return dict(
        init_x=rng.normal(size=(2, N_PAD, 3)).astype(np.float32),
        init_h=rng.normal(size=(2, N_PAD, ATOM_NF)).astype(np.float32),
        steps_x=rng.normal(size=(T, 2, N_PAD, 3)).astype(np.float32),
        steps_h=rng.normal(size=(T, 2, N_PAD, ATOM_NF)).astype(np.float32),
    )


def _queue_sampling_noise(q, noise):
    q.push(_flat_rows(noise["init_x"], SIZES))
    q.push(_flat_rows(noise["init_h"], SIZES))
    for i in range(T):
        q.push(_flat_rows(noise["steps_x"][i], SIZES))
        q.push(_flat_rows(noise["steps_h"][i], SIZES))


def _pocket_arrays(rng):
    rec_x = torch.tensor(rng.normal(size=(N_REC, 3)) * 2.5, dtype=torch.float32)
    rec_h = torch.tensor(rng.normal(size=(N_REC, ATOM_NF)), dtype=torch.float32)
    lig_ref_x = torch.tensor(rng.normal(size=(5, 3)), dtype=torch.float32)
    lig_ref_h = torch.tensor(rng.normal(size=(5, ATOM_NF)), dtype=torch.float32)
    return rec_x, rec_h, lig_ref_x, lig_ref_h


def _sampling_inputs(rec_x, rec_h, noise, init_com=None):
    inputs = dict(
        rec_x=np.broadcast_to(rec_x.numpy(), (2, N_REC, 3)).copy(),
        rec_h=np.broadcast_to(rec_h.numpy(), (2, N_REC, ATOM_NF)).copy(),
        rec_mask=np.ones((2, N_REC), bool),
        lig_mask=np.array([[i < n for i in range(N_PAD)] for n in SIZES]),
        **noise,
    )
    if init_com is not None:
        inputs["init_com"] = np.asarray(init_com, np.float32)
    return inputs


# ------------------------------------------------------------ case builders
def build_chain_fixed_egnn_case():
    """Fixed-encoder EGNN sampling chain: T=8 reverse steps, 2 ligands
    (6 and 7 atoms) of one pocket, via sample_from_encoded_receptors.

    The init frame is passed explicitly on both sides (init_lig_pos /
    init_com): the reference's default frame reads the rec-atom COM AFTER
    the fixed encoder emptied the rec ntype (ligand_diffuser.py:360 — a
    mean over zero nodes), whose value is a DGL implementation detail the
    shim cannot pin (PARITY.md deviation 9)."""
    rng = np.random.default_rng(42)
    rec_x, rec_h, lig_ref_x, lig_ref_h = _pocket_arrays(rng)
    noise = _sampling_noise(rng)

    with tempfile.TemporaryDirectory() as td:
        ref = _build_reference_model(td, "fixed", ATOM_NF)
    utils_mod = load_reference_module("utils")

    q = _RandnQueue()
    _queue_sampling_noise(q, noise)
    g = _pocket_graph(rec_x, rec_h, n_kp=0, lig_x=lig_ref_x, lig_h=lig_ref_h)
    init_lig_pos = rec_x.mean(0, keepdim=True).repeat(2, 1)
    with _patched_torch_rng(q), torch.no_grad():
        gb = dgl_batch([g])
        gb = ref.encode_receptors(gb)
        g_enc = dgl_unbatch(gb)[0]
        copies = utils_mod.copy_graph(g_enc, n_copies=2,
                                      lig_atoms_per_copy=torch.tensor(SIZES))
        g2 = dgl_batch(copies)
        lig_pos_t, lig_feat_t = ref.sample_from_encoded_receptors(
            g2, init_lig_pos=init_lig_pos)
    assert len(q.q) == 0, "reference consumed a different number of draws"

    config = dict(
        atom_nf=ATOM_NF, rec_nf=ATOM_NF, n_timesteps=T,
        rec_encoder_type="fixed", graph_cutoffs=_graph_cutoffs(),
        dynamics=_dyn_cfg(),
    )
    meta = dict(config=config, n_kp=N_REC, kp_feat_dim=ATOM_NF,
                rtol=1e-3, atol=2e-3)
    params = _np_params(ref, KeypointDiffusion(DiffusionConfig(**config)))
    inputs = _sampling_inputs(rec_x, rec_h, noise, init_com=init_lig_pos.numpy())
    expected = {"lig_x": _pad_rows(lig_pos_t, N_PAD),
                "lig_h": _pad_rows(lig_feat_t, N_PAD)}
    return flatten_case("chain_sample", meta, params, inputs, expected)


def build_chain_learned_egnn_case():
    """Learned-encoder EGNN through the reference's PUBLIC entry point
    sample_given_pocket (encode_receptors -> copy_graph -> batch ->
    T-step chain -> input-frame restore), with the executed attention
    semantics. The init frame is the reference's own default: the rec-atom
    COM (rec nodes persist for learned encoders), matched by our init_com
    default."""
    rng = np.random.default_rng(7)
    rec_x, rec_h, lig_ref_x, lig_ref_h = _pocket_arrays(rng)
    noise = _sampling_noise(rng)

    with tempfile.TemporaryDirectory() as td:
        ref = _build_reference_model(td, "learned", HID,
                                     rec_encoder_config=_enc_cfg_ref())

    q = _RandnQueue()
    _queue_sampling_noise(q, noise)
    g = _pocket_graph(rec_x, rec_h, n_kp=N_KP, lig_x=lig_ref_x, lig_h=lig_ref_h)
    with _patched_torch_rng(q), torch.no_grad():
        lig_pos_t, lig_feat_t = ref.sample_given_pocket(g, torch.tensor(SIZES))
    assert len(q.q) == 0

    config = dict(
        atom_nf=ATOM_NF, rec_nf=HID, n_timesteps=T,
        rec_encoder_type="learned", graph_cutoffs=_graph_cutoffs(),
        dynamics=_dyn_cfg(), rec_encoder=_enc_cfg_ours(),
    )
    meta = dict(config=config, n_kp=N_KP, kp_feat_dim=HID,
                rtol=1e-3, atol=2e-3)
    params = _np_params(ref, KeypointDiffusion(DiffusionConfig(**config)))
    inputs = _sampling_inputs(rec_x, rec_h, noise)
    expected = {"lig_x": _pad_rows(lig_pos_t, N_PAD),
                "lig_h": _pad_rows(lig_feat_t, N_PAD)}
    return flatten_case("chain_sample", meta, params, inputs, expected)


def build_chain_learned_gvp_case():
    """GVP family end-to-end: the reference's GVP encoder (executed
    attention) + GVP dynamics chain through sample_given_pocket — covers
    the vector-feature (kp_v) flow, the RBF rk convs, and the GVP per-step
    edge rebuilds at chain level."""
    rng = np.random.default_rng(19)
    rec_x, rec_h, lig_ref_x, lig_ref_h = _pocket_arrays(rng)
    noise = _sampling_noise(rng)

    with tempfile.TemporaryDirectory() as td:
        ref = _build_reference_model(
            td, "learned", GVP_S, rec_encoder_config=_gvp_enc_cfg_ref(),
            architecture="gvp", dynamics_config=dict(_gvp_dyn_cfg(), dropout=0.0),
        )

    q = _RandnQueue()
    _queue_sampling_noise(q, noise)
    g = _pocket_graph(rec_x, rec_h, n_kp=N_KP, lig_x=lig_ref_x, lig_h=lig_ref_h)
    with _patched_torch_rng(q), torch.no_grad():
        lig_pos_t, lig_feat_t = ref.sample_given_pocket(g, torch.tensor(SIZES))
    assert len(q.q) == 0

    config = dict(
        atom_nf=ATOM_NF, rec_nf=GVP_S, n_timesteps=T, architecture="gvp",
        rec_encoder_type="learned", graph_cutoffs=_graph_cutoffs(),
        dynamics=_gvp_dyn_cfg(), rec_encoder=_gvp_enc_cfg_ours(),
    )
    meta = dict(config=config, n_kp=N_KP, kp_feat_dim=GVP_S, kp_vec_dim=GVP_V,
                rtol=1.5e-3, atol=3e-3)
    params = _np_params(ref, KeypointDiffusion(DiffusionConfig(**config)))
    inputs = _sampling_inputs(rec_x, rec_h, noise)
    expected = {"lig_x": _pad_rows(lig_pos_t, N_PAD),
                "lig_h": _pad_rows(lig_feat_t, N_PAD)}
    return flatten_case("chain_sample", meta, params, inputs, expected)


def build_chain_loss_egnn_case():
    """The reference's training forward (normalize -> encode -> OT encoder
    loss -> ligand-COM frame -> noising -> dynamics -> l2/pos/feat) vs our
    loss() on the same timesteps/noise. The `ot` module the reference
    imports is backed by our own native exact-EMD solver, so the
    rec_encoder loss is compared end-to-end too (rec_encoder_loss.py:49-82
    vs kpdiff_tpu/losses/ot.py method='exact')."""
    rng = np.random.default_rng(3)
    n_recs = [12, 10]
    n_ligs = [6, 7]

    with tempfile.TemporaryDirectory() as td:
        ref = _build_reference_model(
            td, "learned", HID, rec_encoder_config=_enc_cfg_ref(),
            rec_encoder_loss_config={"loss_type": "optimal_transport"},
        )

    graphs, rec_np, lig_np = [], [], []
    for n_rec, n_lig in zip(n_recs, n_ligs):
        rec_x = torch.tensor(rng.normal(size=(n_rec, 3)) * 2.5, dtype=torch.float32)
        rec_h = torch.tensor(rng.normal(size=(n_rec, ATOM_NF)), dtype=torch.float32)
        lig_x = torch.tensor(rng.normal(size=(n_lig, 3)), dtype=torch.float32)
        lig_h = torch.tensor(rng.normal(size=(n_lig, ATOM_NF)), dtype=torch.float32)
        graphs.append(_pocket_graph(rec_x, rec_h, n_kp=N_KP, lig_x=lig_x, lig_h=lig_h))
        rec_np.append((rec_x.numpy(), rec_h.numpy()))
        lig_np.append((lig_x.numpy(), lig_h.numpy()))
    gb = dgl_batch(graphs)

    t_ints = np.array([2, 6])
    eps_x = rng.normal(size=(2, N_PAD, 3)).astype(np.float32)
    eps_h = rng.normal(size=(2, N_PAD, ATOM_NF)).astype(np.float32)
    q = _RandnQueue()
    q.t_ints = t_ints
    # reference draw order: eps dict builds 'h' FIRST (ligand_diffuser.py:125-128)
    q.push(_flat_rows(eps_h, n_ligs))
    q.push(_flat_rows(eps_x, n_ligs))
    with _patched_torch_rng(q), torch.no_grad():
        losses_t = ref(gb, interface_points=None)
    assert len(q.q) == 0

    config = dict(
        atom_nf=ATOM_NF, rec_nf=HID, n_timesteps=T,
        rec_encoder_type="learned", graph_cutoffs=_graph_cutoffs(),
        dynamics=_dyn_cfg(), rec_encoder=_enc_cfg_ours(),
        rec_encoder_loss={"loss_type": "optimal_transport", "method": "exact"},
    )
    meta = dict(config=config, n_kp=N_KP, kp_feat_dim=HID,
                rtol=2e-4, atol=2e-5)
    params = _np_params(ref, KeypointDiffusion(DiffusionConfig(**config)))

    n_rec_pad = max(n_recs)
    rec_xp = np.zeros((2, n_rec_pad, 3), np.float32)
    rec_hp = np.zeros((2, n_rec_pad, ATOM_NF), np.float32)
    rec_mask = np.zeros((2, n_rec_pad), bool)
    lig_xp = np.zeros((2, N_PAD, 3), np.float32)
    lig_hp = np.zeros((2, N_PAD, ATOM_NF), np.float32)
    lig_mask = np.zeros((2, N_PAD), bool)
    for i, (n_rec, n_lig) in enumerate(zip(n_recs, n_ligs)):
        rec_xp[i, :n_rec], rec_hp[i, :n_rec] = rec_np[i]
        rec_mask[i, :n_rec] = True
        lig_xp[i, :n_lig], lig_hp[i, :n_lig] = lig_np[i]
        lig_mask[i, :n_lig] = True

    inputs = dict(rec_x=rec_xp, rec_h=rec_hp, rec_mask=rec_mask,
                  lig_x=lig_xp, lig_h=lig_hp, lig_mask=lig_mask,
                  t_ints=t_ints, eps_x=eps_x, eps_h=eps_h)
    expected = {k: np.float32(losses_t[k]) for k in ("l2", "pos", "feat", "rec_encoder")}
    return flatten_case("chain_loss", meta, params, inputs, expected)


def build_chain_loss_hinge_ip_case():
    """The two remaining loss branches at chain level: the receptor-ligand
    clash hinge on the one-shot denoised ligand (rl_dist_threshold > 0,
    ligand_diffuser.py:109-156 — denoise, receptor-COM re-frame, per-graph
    DistanceHingeLoss vs rec atoms) and the interface-point OT variant of
    the encoder loss (rec_encoder_loss.py:73-82)."""
    rng = np.random.default_rng(23)
    n_recs = [12, 10]
    n_ligs = [6, 7]
    n_ips = [5, 6]
    rl_thresh = 2.0

    # rl hinge is configured on the top module, not the loss
    # (ligand_diffuser.py:45-49), so this builder constructs the reference
    # module directly instead of going through _build_reference_model
    with tempfile.TemporaryDirectory() as td:
        ld_mod = load_reference_module("models.ligand_diffuser")
        torch.manual_seed(11)
        ref = ld_mod.KeypointDiffusion(
            atom_nf=ATOM_NF, rec_nf=HID, processed_dataset_dir=_sizedist_dir(td),
            n_timesteps=T, architecture="egnn", rec_encoder_type="learned",
            graph_config={"graph_cutoffs": _graph_cutoffs()},
            dynamics_config=dict(_dyn_cfg(), n_keypoints=N_KP),
            rec_encoder_config=_enc_cfg_ref(),
            rec_encoder_loss_config={"loss_type": "optimal_transport",
                                     "use_interface_points": True},
            precision=1e-4, lig_feat_norm_constant=1,
            rl_dist_threshold=rl_thresh,
        ).eval()

    graphs, rec_np, lig_np, ip_np = [], [], [], []
    for n_rec, n_lig, n_ip in zip(n_recs, n_ligs, n_ips):
        rec_x = torch.tensor(rng.normal(size=(n_rec, 3)) * 2.5, dtype=torch.float32)
        rec_h = torch.tensor(rng.normal(size=(n_rec, ATOM_NF)), dtype=torch.float32)
        lig_x = torch.tensor(rng.normal(size=(n_lig, 3)), dtype=torch.float32)
        lig_h = torch.tensor(rng.normal(size=(n_lig, ATOM_NF)), dtype=torch.float32)
        graphs.append(_pocket_graph(rec_x, rec_h, n_kp=N_KP, lig_x=lig_x, lig_h=lig_h))
        rec_np.append((rec_x.numpy(), rec_h.numpy()))
        lig_np.append((lig_x.numpy(), lig_h.numpy()))
        ip_np.append(rng.normal(size=(n_ip, 3)).astype(np.float32) * 2)
    gb = dgl_batch(graphs)

    t_ints = np.array([3, 5])
    eps_x = rng.normal(size=(2, N_PAD, 3)).astype(np.float32)
    eps_h = rng.normal(size=(2, N_PAD, ATOM_NF)).astype(np.float32)
    q = _RandnQueue()
    q.t_ints = t_ints
    q.push(_flat_rows(eps_h, n_ligs))
    q.push(_flat_rows(eps_x, n_ligs))
    with _patched_torch_rng(q), torch.no_grad():
        losses_t = ref(gb, interface_points=[torch.tensor(p) for p in ip_np])
    assert len(q.q) == 0

    config = dict(
        atom_nf=ATOM_NF, rec_nf=HID, n_timesteps=T,
        rec_encoder_type="learned", graph_cutoffs=_graph_cutoffs(),
        dynamics=_dyn_cfg(), rec_encoder=_enc_cfg_ours(),
        rec_encoder_loss={"loss_type": "optimal_transport", "method": "exact",
                          "use_interface_points": True},
        rl_dist_threshold=rl_thresh,
    )
    meta = dict(config=config, n_kp=N_KP, kp_feat_dim=HID,
                rtol=3e-4, atol=3e-5)
    params = _np_params(ref, KeypointDiffusion(DiffusionConfig(**config)))

    n_rec_pad, n_ip_pad = max(n_recs), max(n_ips)
    rec_xp = np.zeros((2, n_rec_pad, 3), np.float32)
    rec_hp = np.zeros((2, n_rec_pad, ATOM_NF), np.float32)
    rec_mask = np.zeros((2, n_rec_pad), bool)
    lig_xp = np.zeros((2, N_PAD, 3), np.float32)
    lig_hp = np.zeros((2, N_PAD, ATOM_NF), np.float32)
    lig_mask = np.zeros((2, N_PAD), bool)
    ip_xp = np.zeros((2, n_ip_pad, 3), np.float32)
    ip_mask = np.zeros((2, n_ip_pad), bool)
    for i, (n_rec, n_lig, n_ip) in enumerate(zip(n_recs, n_ligs, n_ips)):
        rec_xp[i, :n_rec], rec_hp[i, :n_rec] = rec_np[i]
        rec_mask[i, :n_rec] = True
        lig_xp[i, :n_lig], lig_hp[i, :n_lig] = lig_np[i]
        lig_mask[i, :n_lig] = True
        ip_xp[i, :n_ip] = ip_np[i]
        ip_mask[i, :n_ip] = True

    inputs = dict(rec_x=rec_xp, rec_h=rec_hp, rec_mask=rec_mask,
                  lig_x=lig_xp, lig_h=lig_hp, lig_mask=lig_mask,
                  ip_x=ip_xp, ip_mask=ip_mask,
                  t_ints=t_ints, eps_x=eps_x, eps_h=eps_h)
    expected = {k: np.float32(losses_t[k])
                for k in ("l2", "pos", "feat", "rec_encoder", "rl_hinge")}
    return flatten_case("chain_loss", meta, params, inputs, expected)


def build_chain_two_pockets_egnn_case():
    """The multi-receptor batch path: reference `_sample` with TWO different
    pockets, one ligand each (ligand_diffuser.py:271-340 — batched
    encode_receptors over both graphs, per-receptor copy_graph, one joint
    diffusion batch, per-receptor result grouping) vs our batch=2 padded
    complex with per-item rec masks. Exercises the learned encoder's
    batched execution through the shim (per-graph segment-softmax
    denominators, batched knn/radius) and our rec-mask padding."""
    rng = np.random.default_rng(29)
    n_recs = [12, 10]
    sizes = [5, 7]
    n_rec_pad = max(n_recs)

    with tempfile.TemporaryDirectory() as td:
        ref = _build_reference_model(td, "learned", HID,
                                     rec_encoder_config=_enc_cfg_ref())

    graphs, rec_np = [], []
    for n_rec in n_recs:
        rec_x = torch.tensor(rng.normal(size=(n_rec, 3)) * 2.5, dtype=torch.float32)
        rec_h = torch.tensor(rng.normal(size=(n_rec, ATOM_NF)), dtype=torch.float32)
        lig_ref_x = torch.tensor(rng.normal(size=(5, 3)), dtype=torch.float32)
        lig_ref_h = torch.tensor(rng.normal(size=(5, ATOM_NF)), dtype=torch.float32)
        graphs.append(_pocket_graph(rec_x, rec_h, n_kp=N_KP,
                                    lig_x=lig_ref_x, lig_h=lig_ref_h))
        rec_np.append((rec_x.numpy(), rec_h.numpy()))

    noise = _sampling_noise(rng)
    q = _RandnQueue()
    q.push(_flat_rows(noise["init_x"], sizes))
    q.push(_flat_rows(noise["init_h"], sizes))
    for i in range(T):
        q.push(_flat_rows(noise["steps_x"][i], sizes))
        q.push(_flat_rows(noise["steps_h"][i], sizes))
    with _patched_torch_rng(q), torch.no_grad():
        samples = ref._sample(graphs, n_lig_atoms=[[sizes[0]], [sizes[1]]])
    assert len(q.q) == 0
    lig_pos_t = [samples[0]["positions"][0], samples[1]["positions"][0]]
    lig_feat_t = [samples[0]["features"][0], samples[1]["features"][0]]

    config = dict(
        atom_nf=ATOM_NF, rec_nf=HID, n_timesteps=T,
        rec_encoder_type="learned", graph_cutoffs=_graph_cutoffs(),
        dynamics=_dyn_cfg(), rec_encoder=_enc_cfg_ours(),
    )
    meta = dict(config=config, n_kp=N_KP, kp_feat_dim=HID,
                rtol=1e-3, atol=2e-3)
    params = _np_params(ref, KeypointDiffusion(DiffusionConfig(**config)))

    rec_xp = np.zeros((2, n_rec_pad, 3), np.float32)
    rec_hp = np.zeros((2, n_rec_pad, ATOM_NF), np.float32)
    rec_mask = np.zeros((2, n_rec_pad), bool)
    for i, n_rec in enumerate(n_recs):
        rec_xp[i, :n_rec], rec_hp[i, :n_rec] = rec_np[i]
        rec_mask[i, :n_rec] = True
    inputs = dict(
        rec_x=rec_xp, rec_h=rec_hp, rec_mask=rec_mask,
        lig_mask=np.array([[i < n for i in range(N_PAD)] for n in sizes]),
        **noise,
    )
    expected = {"lig_x": _pad_rows(lig_pos_t, N_PAD),
                "lig_h": _pad_rows(lig_feat_t, N_PAD)}
    return flatten_case("chain_sample", meta, params, inputs, expected)


def build_chain_frames_egnn_case():
    """The visualize/trajectory path: sample_given_pocket(visualize=True)
    collects a per-step frame restored to the input frame via the current
    keypoint COM (ligand_diffuser.py:411-435, per-frame batched copy_graph
    + unnormalize), driving the reference's .pdb trajectory writer; ours is
    sample(return_every=1) -> frames_x/frames_h. The reference's frame 0 is
    the pre-chain initial state (ours starts after step 1), so our frame k
    must equal the reference's frame k+1."""
    rng = np.random.default_rng(37)
    rec_x, rec_h, lig_ref_x, lig_ref_h = _pocket_arrays(rng)
    noise = _sampling_noise(rng)

    with tempfile.TemporaryDirectory() as td:
        ref = _build_reference_model(td, "learned", HID,
                                     rec_encoder_config=_enc_cfg_ref())

    q = _RandnQueue()
    _queue_sampling_noise(q, noise)
    g = _pocket_graph(rec_x, rec_h, n_kp=N_KP, lig_x=lig_ref_x, lig_h=lig_ref_h)
    with _patched_torch_rng(q), torch.no_grad():
        pos_frames, feat_frames = ref.sample_given_pocket(
            g, torch.tensor(SIZES), visualize=True)
    assert len(q.q) == 0
    # pos_frames[i] = per-ligand tuple of T+1 frames (init + each step)
    exp_frames_x = np.stack(
        [_pad_rows([pos_frames[i][k + 1] for i in range(2)], N_PAD) for k in range(T)])
    exp_frames_h = np.stack(
        [_pad_rows([feat_frames[i][k + 1] for i in range(2)], N_PAD) for k in range(T)])

    config = dict(
        atom_nf=ATOM_NF, rec_nf=HID, n_timesteps=T,
        rec_encoder_type="learned", graph_cutoffs=_graph_cutoffs(),
        dynamics=_dyn_cfg(), rec_encoder=_enc_cfg_ours(),
    )
    meta = dict(config=config, n_kp=N_KP, kp_feat_dim=HID,
                return_every=1, rtol=1e-3, atol=2e-3)
    params = _np_params(ref, KeypointDiffusion(DiffusionConfig(**config)))
    inputs = _sampling_inputs(rec_x, rec_h, noise)
    expected = {
        "lig_x": _pad_rows([pos_frames[i][-1] for i in range(2)], N_PAD),
        "lig_h": _pad_rows([feat_frames[i][-1] for i in range(2)], N_PAD),
        "frames_x": exp_frames_x,
        "frames_h": exp_frames_h,
    }
    return flatten_case("chain_sample", meta, params, inputs, expected)


def build_chain_loss_fake_atoms_case():
    """use_fake_atoms loss semantics (PARITY.md deviation 1): the reference
    MEANS to mask the x-loss to real atoms but derives the mask from the
    NOISED feature's last channel (`h_0[:, -1:].bool()` after
    noised_representation overwrote h_0, ligand_diffuser.py:159-164) —
    almost surely all-True, so the executed x-loss is unmasked. Frozen with
    `fake_atom_loss_semantics: executed`, which must match the reference;
    the live test additionally asserts the 'intent' default DIVERGES on
    this batch (the knob is not dead code)."""
    rng = np.random.default_rng(31)
    n_recs = [12, 10]
    n_ligs = [6, 7]
    fake_counts = [2, 1]  # trailing atoms flagged as fake per ligand

    with tempfile.TemporaryDirectory() as td:
        ld_mod = load_reference_module("models.ligand_diffuser")
        torch.manual_seed(11)
        ref = ld_mod.KeypointDiffusion(
            atom_nf=ATOM_NF, rec_nf=ATOM_NF, processed_dataset_dir=_sizedist_dir(td),
            n_timesteps=T, architecture="egnn", rec_encoder_type="fixed",
            graph_config={"graph_cutoffs": _graph_cutoffs()},
            dynamics_config=dict(_dyn_cfg(), n_keypoints=N_KP),
            rec_encoder_config={}, rec_encoder_loss_config={},
            precision=1e-4, lig_feat_norm_constant=1, use_fake_atoms=True,
        ).eval()

    graphs, rec_np, lig_np = [], [], []
    for n_rec, n_lig, n_fake in zip(n_recs, n_ligs, fake_counts):
        rec_x = torch.tensor(rng.normal(size=(n_rec, 3)) * 2.5, dtype=torch.float32)
        rec_h = torch.tensor(rng.normal(size=(n_rec, ATOM_NF)), dtype=torch.float32)
        lig_x = torch.tensor(rng.normal(size=(n_lig, 3)), dtype=torch.float32)
        lig_h = torch.tensor(rng.normal(size=(n_lig, ATOM_NF)), dtype=torch.float32)
        lig_h[:, -1] = 0.0
        lig_h[n_lig - n_fake:, -1] = 1.0  # fake-atom channel
        graphs.append(_pocket_graph(rec_x, rec_h, n_kp=0, lig_x=lig_x, lig_h=lig_h))
        rec_np.append((rec_x.numpy(), rec_h.numpy()))
        lig_np.append((lig_x.numpy(), lig_h.numpy()))
    gb = dgl_batch(graphs)

    t_ints = np.array([2, 6])
    eps_x = rng.normal(size=(2, N_PAD, 3)).astype(np.float32)
    eps_h = rng.normal(size=(2, N_PAD, ATOM_NF)).astype(np.float32)
    q = _RandnQueue()
    q.t_ints = t_ints
    q.push(_flat_rows(eps_h, n_ligs))
    q.push(_flat_rows(eps_x, n_ligs))
    with _patched_torch_rng(q), torch.no_grad():
        losses_t = ref(gb, interface_points=None)
    assert len(q.q) == 0

    config = dict(
        atom_nf=ATOM_NF, rec_nf=ATOM_NF, n_timesteps=T,
        rec_encoder_type="fixed", graph_cutoffs=_graph_cutoffs(),
        dynamics=_dyn_cfg(), use_fake_atoms=True,
        fake_atom_loss_semantics="executed",
    )
    meta = dict(config=config, n_kp=max(n_recs), kp_feat_dim=ATOM_NF,
                rtol=2e-4, atol=2e-5)
    params = _np_params(ref, KeypointDiffusion(DiffusionConfig(**config)))

    n_rec_pad = max(n_recs)
    rec_xp = np.zeros((2, n_rec_pad, 3), np.float32)
    rec_hp = np.zeros((2, n_rec_pad, ATOM_NF), np.float32)
    rec_mask = np.zeros((2, n_rec_pad), bool)
    lig_xp = np.zeros((2, N_PAD, 3), np.float32)
    lig_hp = np.zeros((2, N_PAD, ATOM_NF), np.float32)
    lig_mask = np.zeros((2, N_PAD), bool)
    for i, (n_rec, n_lig) in enumerate(zip(n_recs, n_ligs)):
        rec_xp[i, :n_rec], rec_hp[i, :n_rec] = rec_np[i]
        rec_mask[i, :n_rec] = True
        lig_xp[i, :n_lig], lig_hp[i, :n_lig] = lig_np[i]
        lig_mask[i, :n_lig] = True

    inputs = dict(rec_x=rec_xp, rec_h=rec_hp, rec_mask=rec_mask,
                  lig_x=lig_xp, lig_h=lig_hp, lig_mask=lig_mask,
                  t_ints=t_ints, eps_x=eps_x, eps_h=eps_h)
    expected = {k: np.float32(losses_t[k]) for k in ("l2", "pos", "feat")}
    return flatten_case("chain_loss", meta, params, inputs, expected)


CHAIN_BUILDERS = {
    "refexec_chain_fixed_egnn": build_chain_fixed_egnn_case,
    "refexec_chain_learned_egnn": build_chain_learned_egnn_case,
    "refexec_chain_learned_gvp": build_chain_learned_gvp_case,
    "refexec_chain_loss_egnn": build_chain_loss_egnn_case,
    "refexec_chain_loss_hinge_ip_egnn": build_chain_loss_hinge_ip_case,
    "refexec_chain_loss_fake_atoms_egnn": build_chain_loss_fake_atoms_case,
    "refexec_chain_two_pockets_egnn": build_chain_two_pockets_egnn_case,
    "refexec_chain_frames_egnn": build_chain_frames_egnn_case,
}


# -------------------------------------------------------------------- tests
def _assert_flat_case(flat):
    """Round-trip through npz (exactly what the golden fixture stores) and
    run the torch-free side against the embedded expectations."""
    buf = io.BytesIO()
    np.savez(buf, **flat)
    buf.seek(0)
    assert_case(np.load(buf, allow_pickle=False))


@pytest.mark.slow
@pytest.mark.parametrize("name", sorted(CHAIN_BUILDERS), ids=sorted(CHAIN_BUILDERS))
def test_reference_chain_parity(name):
    _assert_flat_case(CHAIN_BUILDERS[name]())


@pytest.mark.slow
def test_fake_atom_loss_semantics_diverge():
    """The 'intent' default must NOT reproduce the reference's executed
    fake-atom x-loss on a batch containing fake atoms — otherwise the
    fake_atom_loss_semantics knob is dead code."""
    import json

    from tests.parity_jax import run_case, unflatten_case

    flat = build_chain_loss_fake_atoms_case()
    buf = io.BytesIO()
    np.savez(buf, **flat)
    buf.seek(0)
    kind, meta, params, inputs, expected = unflatten_case(np.load(buf, allow_pickle=False))
    meta["config"]["fake_atom_loss_semantics"] = "intent"
    got = run_case(kind, meta, params, inputs)
    assert not np.allclose(got["pos"], expected["pos"], rtol=1e-5), \
        "intent vs executed fake-atom semantics should differ here"
