"""Numerical parity vs the REFERENCE'S OWN models/dynamics.py, executed
through the minimal DGL/torch_cluster emulation in tests/refexec.py.

This upgrades the torch-parity story from "same-author reimplementation"
(tests/test_torch_parity.py) to "the actual reference code": the real
LigRecDynamics builds its own ll/kl/lk edges (through the shim's
torch_cluster functions), computes its own messages, and its state_dict
feeds the same converter used for checkpoint import.

The message_norm=0 rows pin down the z-normalization semantics question
documented in tests/refexec.py: under DGL's actual hetero-ndata getitem
(fresh dict, the normalization loop at dynamics.py:188-192 is a lost
write) the reference applies NO z — matched by our
`dynamics.z_semantics: executed`; under intended write-back semantics it
divides by avg-degree+1 — matched by our default 'intent'.
"""
import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from kpdiff_tpu.models.complex import make_complex  # noqa: F401  (parity w/ sibling test imports)
from kpdiff_tpu.models.diffusion import DiffusionConfig, KeypointDiffusion
from kpdiff_tpu.ops.neighbors import dense_radius_adjacency
from kpdiff_tpu.utils.torch_import import convert_egnn_dynamics_state_dict

from tests.refexec import HeteroGraphShim, load_reference_dynamics, tc_radius_graph

HID = 8
ATOM_NF = 6
REC_NF = 5
N_LAYERS = 2
KL_K = 2
LL_CUT = 6.0
KK_CUT = 4.0
NL, NK = 7, 5


def _build_graph(lig_x, lig_h, kp_x, kp_h, writeback):
    g = HeteroGraphShim(
        num_nodes={"lig": NL, "kp": NK},
        etypes={"ll": ("lig", "lig"), "kl": ("kp", "lig"),
                "lk": ("lig", "kp"), "kk": ("kp", "kp")},
        ndata_writeback=writeback,
    )
    kk = tc_radius_graph(kp_x, KK_CUT, max_num_neighbors=NK)
    g.add_edges(kk[0], kk[1], etype="kk")
    g.nodes["lig"].data["h_0"] = lig_h
    g.nodes["lig"].data["x_0"] = lig_x
    g.nodes["kp"].data["h_0"] = kp_h
    g.nodes["kp"].data["x_0"] = kp_x
    g.set_batch_num_nodes({"lig": torch.tensor([NL]), "kp": torch.tensor([NK])})
    g.set_batch_num_edges({("kp", "kk", "kp"): torch.tensor([kk.shape[1]]),
                           ("lig", "ll", "lig"): torch.tensor([0]),
                           ("kp", "kl", "lig"): torch.tensor([0]),
                           ("lig", "lk", "kp"): torch.tensor([0])})
    return g


@pytest.mark.slow
@pytest.mark.parametrize(
    "message_norm,writeback,z_semantics",
    [
        (1.0, False, "intent"),      # z inert; pure message/edge parity
        (0, False, "executed"),      # DGL's actual hetero-ndata semantics
        (0, True, "intent"),         # the intended (write-back) semantics
    ],
)
def test_reference_dynamics_execution_parity(message_norm, writeback, z_semantics):
    ref_dyn_mod = load_reference_dynamics()

    torch.manual_seed(0)
    rng = np.random.default_rng(0)
    lig_x = torch.tensor(rng.normal(size=(NL, 3)) * 2, dtype=torch.float32)
    lig_h = torch.tensor(rng.normal(size=(NL, ATOM_NF)), dtype=torch.float32)
    kp_x = torch.tensor(rng.normal(size=(NK, 3)) * 3, dtype=torch.float32)
    kp_h = torch.tensor(rng.normal(size=(NK, REC_NF)), dtype=torch.float32)
    t_val = 0.35

    dyn = ref_dyn_mod.LigRecDynamics(
        atom_nf=ATOM_NF, rec_nf=REC_NF, n_layers=N_LAYERS, hidden_nf=HID,
        use_tanh=True, message_norm=message_norm, n_keypoints=NK,
        graph_cutoffs={"ll": LL_CUT, "kl": 8.0}, update_kp_feat=True,
        norm=True, ll_k=0, kl_k=KL_K,
    )
    g = _build_graph(lig_x, lig_h, kp_x, kp_h, writeback)
    with torch.no_grad():
        eps_h_t, eps_x_t = dyn(
            g, torch.tensor([t_val]),
            {"lig": torch.zeros(NL, dtype=torch.long),
             "kp": torch.zeros(NK, dtype=torch.long)},
        )

    sd = {k: v.detach().numpy() for k, v in dyn.state_dict().items()}
    params_dyn = convert_egnn_dynamics_state_dict(
        sd, n_layers=N_LAYERS, update_kp_feat=True, rec_nf=REC_NF, hidden_nf=HID
    )

    cfg = DiffusionConfig(
        atom_nf=ATOM_NF, rec_nf=REC_NF, n_timesteps=10, rec_encoder_type="fixed",
        graph_cutoffs={"rr": KK_CUT, "kk": KK_CUT, "kl": 8, "ll": LL_CUT, "rk": 100},
        dynamics=dict(n_layers=N_LAYERS, hidden_nf=HID, use_tanh=True,
                      message_norm=message_norm, update_kp_feat=True, norm=True,
                      ll_k=0, kl_k=KL_K, z_semantics=z_semantics),
    )
    model = KeypointDiffusion(cfg)

    lig_mask = jnp.ones((1, NL), bool)
    kp_mask = jnp.ones((1, NK), bool)
    kk = dense_radius_adjacency(jnp.asarray(kp_x.numpy())[None], kp_mask,
                                jnp.asarray(kp_x.numpy())[None], kp_mask, KK_CUT,
                                exclude_self=True)
    eps_h_j, eps_x_j = model._apply_dynamics(
        {"dynamics": jax.tree_util.tree_map(jnp.asarray, params_dyn)},
        jnp.asarray(lig_x.numpy())[None], jnp.asarray(lig_h.numpy())[None], lig_mask,
        jnp.asarray(kp_x.numpy())[None], jnp.asarray(kp_h.numpy())[None], kp_mask,
        jnp.full((1,), t_val), kk,
    )

    np.testing.assert_allclose(np.asarray(eps_h_j)[0], eps_h_t.numpy(), rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(eps_x_j)[0], eps_x_t.numpy(), rtol=2e-4, atol=2e-5)


GVP_S = 12
GVP_V = 4
N_CONVS = 2
N_MSG = 2
N_UPD = 1
N_NOISE = 2


@pytest.mark.slow
@pytest.mark.parametrize("message_norm", ["mean", 10.0])
def test_reference_gvp_dynamics_execution_parity(message_norm):
    """The reference's own models/dynamics_gvp.py + models/gvp.py executed
    through the shim vs our GVP dynamics with converted weights. (The GVP
    modules use the correct per-ntype normalization pattern — gvp.py:512,
    298-301 — so there is no z-semantics split here.)"""
    from kpdiff_tpu.utils.torch_import import convert_gvp_dynamics_state_dict
    from tests.refexec import load_reference_gvp_dynamics

    ref_mod = load_reference_gvp_dynamics()

    torch.manual_seed(3)
    rng = np.random.default_rng(3)
    lig_x = torch.tensor(rng.normal(size=(NL, 3)) * 2, dtype=torch.float32)
    lig_h = torch.tensor(rng.normal(size=(NL, ATOM_NF)), dtype=torch.float32)
    kp_x = torch.tensor(rng.normal(size=(NK, 3)) * 3, dtype=torch.float32)
    kp_h = torch.tensor(rng.normal(size=(NK, REC_NF)), dtype=torch.float32)
    kp_v = torch.tensor(rng.normal(size=(NK, GVP_V, 3)), dtype=torch.float32)
    t_val = 0.6

    dyn = ref_mod.LigRecDynamicsGVP(
        n_lig_scalars=ATOM_NF, n_kp_scalars=REC_NF, vector_size=GVP_V,
        n_convs=N_CONVS, n_hidden_scalars=GVP_S, message_norm=message_norm,
        graph_cutoffs={"ll": LL_CUT, "kl": 8.0}, update_kp=True, ll_k=0,
        kl_k=KL_K, n_message_gvps=N_MSG, n_update_gvps=N_UPD,
        n_noise_gvps=N_NOISE, dropout=0.0,
    ).eval()
    g = _build_graph(lig_x, lig_h, kp_x, kp_h, writeback=False)
    g.nodes["kp"].data["v_0"] = kp_v
    with torch.no_grad():
        eps_h_t, eps_x_t = dyn(
            g, torch.tensor([t_val]),
            {"lig": torch.zeros(NL, dtype=torch.long),
             "kp": torch.zeros(NK, dtype=torch.long)},
        )

    sd = {k: v.detach().numpy() for k, v in dyn.state_dict().items()}
    params_dyn = convert_gvp_dynamics_state_dict(
        sd, n_convs=N_CONVS, update_kp=True, n_message_gvps=N_MSG,
        n_update_gvps=N_UPD, n_noise_gvps=N_NOISE,
    )

    cfg = DiffusionConfig(
        atom_nf=ATOM_NF, rec_nf=REC_NF, n_timesteps=10, architecture="gvp",
        rec_encoder_type="fixed",
        graph_cutoffs={"rr": KK_CUT, "kk": KK_CUT, "kl": 8, "ll": LL_CUT, "rk": 100},
        rec_encoder=dict(vector_size=GVP_V),
        dynamics=dict(vector_size=GVP_V, n_convs=N_CONVS, n_hidden_scalars=GVP_S,
                      update_kp=True, message_norm=message_norm, ll_k=0, kl_k=KL_K,
                      n_message_gvps=N_MSG, n_update_gvps=N_UPD, n_noise_gvps=N_NOISE),
    )
    model = KeypointDiffusion(cfg)
    lig_mask = jnp.ones((1, NL), bool)
    kp_mask = jnp.ones((1, NK), bool)
    kk = dense_radius_adjacency(jnp.asarray(kp_x.numpy())[None], kp_mask,
                                jnp.asarray(kp_x.numpy())[None], kp_mask, KK_CUT,
                                exclude_self=True)
    eps_h_j, eps_x_j = model._apply_dynamics(
        {"dynamics": jax.tree_util.tree_map(jnp.asarray, params_dyn)},
        jnp.asarray(lig_x.numpy())[None], jnp.asarray(lig_h.numpy())[None], lig_mask,
        jnp.asarray(kp_x.numpy())[None], jnp.asarray(kp_h.numpy())[None], kp_mask,
        jnp.full((1,), t_val), kk, jnp.asarray(kp_v.numpy())[None],
    )

    np.testing.assert_allclose(np.asarray(eps_h_j)[0], eps_h_t.numpy(), rtol=5e-4, atol=5e-5)
    np.testing.assert_allclose(np.asarray(eps_x_j)[0], eps_x_t.numpy(), rtol=5e-4, atol=5e-5)


@pytest.mark.slow
def test_reference_egnn_encoder_execution_parity():
    """The reference's own models/receptor_encoder.py (ReceptorConv +
    RecKeyConv attention positioning + k_closest feats) executed through
    the shim vs our learned EGNN encoder with converted weights. Exercises
    the encoder-side DGL surface: u_dot_v/v_mul_e/u_mul_e/copy_u builtins,
    segment_csr softmax denominators, custom mailbox reduce
    (collect_dists), readout_nodes, and the remove+re-add rk edge flow.

    Matching requires attn_semantics='executed': the reference's keypoint
    'softmax' never writes the scaled/exponentiated logits back to the
    edges (receptor_encoder.py:201-210 operate on locals), so the executed
    attention numerator is the RAW dot product — found by this very test."""
    from kpdiff_tpu.models.complex import synthetic_batch
    from kpdiff_tpu.utils.torch_import import convert_egnn_encoder_state_dict
    from tests.refexec import load_reference_module, tc_radius_graph

    enc_mod = load_reference_module("models.receptor_encoder")

    IN_F, HID, N_CONVS_E, N_KP, K_CLOSEST, RR_CUT = 6, 12, 2, 4, 3, 4.0
    torch.manual_seed(1)
    rng = np.random.default_rng(1)
    N = 14
    x0 = torch.tensor(rng.normal(size=(N, 3)) * 2.5, dtype=torch.float32)
    h0 = torch.tensor(rng.normal(size=(N, IN_F)), dtype=torch.float32)
    res_idx = torch.tensor(rng.integers(0, 4, size=N))

    enc = enc_mod.ReceptorEncoder(
        n_convs=N_CONVS_E, n_keypoints=N_KP, graph_cutoffs={"kk": 8.0},
        in_n_node_feat=IN_F, use_sameres_feat=True, hidden_n_node_feat=HID,
        out_n_node_feat=HID, use_tanh=True, coords_range=10, kp_feat_scale=1,
        message_norm=0, kp_rad=0.0, k_closest=K_CLOSEST, norm=True,
        fix_pos=False,
    )

    g = HeteroGraphShim(
        num_nodes={"rec": N, "kp": N_KP},
        etypes={"rr": ("rec", "rec"), "rk": ("rec", "kp"), "kk": ("kp", "kp")},
    )
    rr = tc_radius_graph(x0, RR_CUT, max_num_neighbors=N)
    g.add_edges(rr[0], rr[1], etype="rr")
    g.edges["rr"].data["same_res"] = (res_idx[rr[0]] == res_idx[rr[1]]).float()[:, None]
    # initial rk edges: complete bipartite, kp-major order (the processing
    # pipeline connects every keypoint to every receptor atom; the
    # segment_csr denominator at receptor_encoder.py:204-208 assumes it)
    rk_rec = torch.arange(N).repeat(N_KP)
    rk_kp = torch.arange(N_KP).repeat_interleave(N)
    g.add_edges(rk_rec, rk_kp, etype="rk")
    g.nodes["rec"].data["h_0"] = h0
    g.nodes["rec"].data["x_0"] = x0
    g.set_batch_num_nodes({"rec": torch.tensor([N]), "kp": torch.tensor([N_KP])})
    g.set_batch_num_edges({("rec", "rr", "rec"): torch.tensor([rr.shape[1]]),
                           ("rec", "rk", "kp"): torch.tensor([N * N_KP]),
                           ("kp", "kk", "kp"): torch.tensor([0])})

    with torch.no_grad():
        g_out = enc(g, {"rec": torch.zeros(N, dtype=torch.long),
                        "kp": torch.zeros(N_KP, dtype=torch.long)})
    kp_pos_t = g_out.nodes["kp"].data["x_0"]
    kp_feat_t = g_out.nodes["kp"].data["h_0"]

    sd = {k: v.detach().numpy() for k, v in enc.state_dict().items()}
    enc_params = convert_egnn_encoder_state_dict(
        sd, n_convs=N_CONVS_E, hidden=HID, out_feat=HID, in_feat=IN_F,
        use_sameres_feat=True, fix_pos=False, norm=True,
    )

    cfg = DiffusionConfig(
        atom_nf=5, rec_nf=HID, n_timesteps=10, rec_encoder_type="learned",
        graph_cutoffs={"rr": RR_CUT, "rk": 100, "kk": 8, "kl": 8, "ll": 5},
        dynamics=dict(n_layers=1, hidden_nf=8, kl_k=2),
        rec_encoder=dict(
            n_keypoints=N_KP, in_n_node_feat=IN_F, hidden_n_node_feat=HID,
            out_n_node_feat=HID, n_convs=N_CONVS_E, use_tanh=True,
            message_norm=0, k_closest=K_CLOSEST, kp_rad=0.0, norm=True,
            fix_pos=False, use_sameres_feat=True,
            # the reference's executed keypoint attention is NOT a softmax:
            # receptor_encoder.py:201-210 exp/scale only locals, so the
            # numerator stays the raw dot (encoder_egnn.py attn_semantics)
            attn_semantics="executed",
        ),
    )
    model = KeypointDiffusion(cfg)
    cpx = synthetic_batch(0, batch=1, n_rec_pad=N, n_lig_pad=6, n_rec_feat=IN_F,
                          n_lig_feat=5, n_kp=N_KP, kp_feat_dim=HID, min_rec=N, min_lig=6)
    cpx = cpx.replace(
        rec_x=jnp.asarray(x0.numpy())[None],
        rec_h=jnp.asarray(h0.numpy())[None],
        rec_res_idx=jnp.asarray(res_idx.numpy().astype(np.int32))[None],
    )
    enc_j, _ = model.encode({"encoder": jax.tree_util.tree_map(jnp.asarray, enc_params)}, cpx)

    np.testing.assert_allclose(np.asarray(enc_j.kp_x)[0], kp_pos_t.numpy(), rtol=5e-4, atol=5e-5)
    np.testing.assert_allclose(np.asarray(enc_j.kp_h)[0], kp_feat_t.numpy(), rtol=5e-4, atol=5e-5)


@pytest.mark.slow
def test_reference_gvp_encoder_execution_parity():
    """The reference's own models/receptor_encoder_gvp.py executed through
    the shim vs our GVP encoder with converted weights. The keypoint
    attention requires attn_semantics='executed' — the GVP
    KeypointInitializer has the SAME lost exp/scale as the EGNN RecKeyConv
    (receptor_encoder_gvp.py:71-81)."""
    from kpdiff_tpu.models.complex import synthetic_batch
    from kpdiff_tpu.utils.torch_import import convert_gvp_encoder_state_dict
    from tests.refexec import load_reference_module, tc_radius_graph

    enc_mod = load_reference_module("models.receptor_encoder_gvp")

    IN_F, S, V, N_KP, K_CLOSEST = 6, 10, 3, 4, 3
    N_RR, N_RK, N_MSG, N_UPD = 2, 2, 2, 1
    RR_CUT, RK_RBF_DMAX = 4.0, 100.0
    torch.manual_seed(5)
    rng = np.random.default_rng(5)
    N = 12
    x0 = torch.tensor(rng.normal(size=(N, 3)) * 2.5, dtype=torch.float32)
    h0 = torch.tensor(rng.normal(size=(N, IN_F)), dtype=torch.float32)

    enc = enc_mod.ReceptorEncoderGVP(
        in_scalar_size=IN_F, out_scalar_size=S, n_message_gvps=N_MSG,
        n_update_gvps=N_UPD, vector_size=V, n_rr_convs=N_RR, n_rk_convs=N_RK,
        message_norm=10.0, use_sameres_feat=False, kp_rad=0,
        k_closest=K_CLOSEST, dropout=0.0, n_keypoints=N_KP,
        graph_cutoffs={"rr": RR_CUT, "rk": RK_RBF_DMAX, "kk": 8.0},
    ).eval()

    g = HeteroGraphShim(
        num_nodes={"rec": N, "kp": N_KP},
        etypes={"rr": ("rec", "rec"), "rk": ("rec", "kp"), "kk": ("kp", "kp")},
    )
    rr = tc_radius_graph(x0, RR_CUT, max_num_neighbors=N)
    g.add_edges(rr[0], rr[1], etype="rr")
    g.add_edges(torch.arange(N).repeat(N_KP), torch.arange(N_KP).repeat_interleave(N),
                etype="rk")  # initial rk: complete bipartite, kp-major
    g.nodes["rec"].data["h_0"] = h0
    g.nodes["rec"].data["x_0"] = x0
    g.set_batch_num_nodes({"rec": torch.tensor([N]), "kp": torch.tensor([N_KP])})
    g.set_batch_num_edges({("rec", "rr", "rec"): torch.tensor([rr.shape[1]]),
                           ("rec", "rk", "kp"): torch.tensor([N * N_KP]),
                           ("kp", "kk", "kp"): torch.tensor([0])})

    with torch.no_grad():
        g_out = enc(g, {"rec": torch.zeros(N, dtype=torch.long),
                        "kp": torch.zeros(N_KP, dtype=torch.long)})
    kp_pos_t = g_out.nodes["kp"].data["x_0"]
    kp_h_t = g_out.nodes["kp"].data["h_0"]
    kp_v_t = g_out.nodes["kp"].data["v_0"]

    sd = {k: v.detach().numpy() for k, v in enc.state_dict().items()}
    enc_params = convert_gvp_encoder_state_dict(sd, N_RR, N_RK, N_MSG, N_UPD)

    cfg = DiffusionConfig(
        atom_nf=5, rec_nf=S, n_timesteps=10, architecture="gvp",
        rec_encoder_type="learned",
        graph_cutoffs={"rr": RR_CUT, "rk": RK_RBF_DMAX, "kk": 8, "kl": 8, "ll": 5},
        dynamics=dict(vector_size=V, n_convs=1, n_hidden_scalars=8, kl_k=2,
                      n_message_gvps=1, n_update_gvps=1, n_noise_gvps=2),
        rec_encoder=dict(
            in_scalar_size=IN_F, n_keypoints=N_KP, out_scalar_size=S,
            vector_size=V, n_rr_convs=N_RR, n_rk_convs=N_RK, message_norm=10.0,
            k_closest=K_CLOSEST, kp_rad=0, n_message_gvps=N_MSG,
            n_update_gvps=N_UPD, dropout=0.0, attn_semantics="executed",
        ),
    )
    model = KeypointDiffusion(cfg)
    cpx = synthetic_batch(0, batch=1, n_rec_pad=N, n_lig_pad=6, n_rec_feat=IN_F,
                          n_lig_feat=5, n_kp=N_KP, kp_feat_dim=S, kp_vec_dim=V,
                          min_rec=N, min_lig=6)
    cpx = cpx.replace(rec_x=jnp.asarray(x0.numpy())[None], rec_h=jnp.asarray(h0.numpy())[None])
    enc_j, _ = model.encode({"encoder": jax.tree_util.tree_map(jnp.asarray, enc_params)}, cpx)

    np.testing.assert_allclose(np.asarray(enc_j.kp_x)[0], kp_pos_t.numpy(), rtol=5e-4, atol=5e-5)
    np.testing.assert_allclose(np.asarray(enc_j.kp_h)[0], kp_h_t.numpy(), rtol=5e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(enc_j.kp_v)[0], kp_v_t.numpy(), rtol=5e-4, atol=1e-4)


@pytest.mark.slow
def test_whole_model_import_from_real_reference_modules():
    """Capstone: a complete state_dict assembled from the REFERENCE'S OWN
    modules (LigRecDynamics + ReceptorEncoder, prefixed 'dynamics.' /
    'rec_encoder.' exactly as the reference LigandDiffuser module tree,
    ligand_diffuser.py:65,73) -> convert_reference_checkpoint -> our model
    with the documented executed-semantics import knobs -> encode + sample
    end-to-end. Pins the full import recipe against real module key sets."""
    from kpdiff_tpu.models.complex import synthetic_batch
    from kpdiff_tpu.utils.torch_import import convert_reference_checkpoint
    from tests.refexec import load_reference_module

    dyn_mod = load_reference_dynamics()
    enc_mod = load_reference_module("models.receptor_encoder")

    IN_F, HID, N_CONVS_E, N_KP, K_CLOSEST = 6, 12, 2, 4, 3
    torch.manual_seed(2)
    dyn = dyn_mod.LigRecDynamics(
        atom_nf=ATOM_NF, rec_nf=HID, n_layers=N_LAYERS, hidden_nf=8,
        use_tanh=True, message_norm=0, n_keypoints=N_KP,
        graph_cutoffs={"ll": LL_CUT, "kl": 8.0}, update_kp_feat=True,
        norm=True, ll_k=0, kl_k=KL_K,
    )
    enc = enc_mod.ReceptorEncoder(
        n_convs=N_CONVS_E, n_keypoints=N_KP, graph_cutoffs={"kk": 8.0},
        in_n_node_feat=IN_F, use_sameres_feat=True, hidden_n_node_feat=HID,
        out_n_node_feat=HID, use_tanh=True, coords_range=10, kp_feat_scale=1,
        message_norm=0, kp_rad=0.0, k_closest=K_CLOSEST, norm=True,
        fix_pos=False,
    )
    sd = {f"dynamics.{k}": v.detach().numpy() for k, v in dyn.state_dict().items()}
    sd.update({f"rec_encoder.{k}": v.detach().numpy() for k, v in enc.state_dict().items()})

    cfg = DiffusionConfig(
        atom_nf=ATOM_NF, rec_nf=HID, n_timesteps=10, rec_encoder_type="learned",
        graph_cutoffs={"rr": 4.0, "rk": 100, "kk": 8, "kl": 8, "ll": LL_CUT},
        dynamics=dict(n_layers=N_LAYERS, hidden_nf=8, kl_k=KL_K,
                      update_kp_feat=True, message_norm=0, use_tanh=True,
                      norm=True, z_semantics="executed"),
        rec_encoder=dict(
            n_keypoints=N_KP, in_n_node_feat=IN_F, hidden_n_node_feat=HID,
            out_n_node_feat=HID, n_convs=N_CONVS_E, use_tanh=True,
            message_norm=0, k_closest=K_CLOSEST, kp_rad=0.0, norm=True,
            fix_pos=False, use_sameres_feat=True, attn_semantics="executed",
        ),
    )
    model = KeypointDiffusion(cfg)
    cpx = synthetic_batch(0, batch=2, n_rec_pad=14, n_lig_pad=6, n_rec_feat=IN_F,
                          n_lig_feat=ATOM_NF, n_kp=N_KP, kp_feat_dim=HID,
                          min_rec=10, min_lig=4)

    params = convert_reference_checkpoint(sd, model)
    params = jax.tree_util.tree_map(jnp.asarray, params)
    init_params = model.init(jax.random.key(0), cpx)
    shapes = lambda t: {jax.tree_util.keystr(p): tuple(np.shape(l))
                        for p, l in jax.tree_util.tree_leaves_with_path(t)}
    assert shapes(params) == shapes(init_params)

    enc_out, kk_out = model.encode(params, cpx)
    out = model.sample(params, jax.random.key(1), enc_out, kk_out, init_com=None)
    assert np.isfinite(np.asarray(out["lig_x"])).all()
    assert np.isfinite(np.asarray(out["lig_h"])).all()


@pytest.mark.slow
def test_reference_z_normalization_is_a_lost_write():
    """The two candidate ndata semantics must DISAGREE under message_norm=0
    (otherwise the z_semantics knob is untestable dead code)."""
    ref_dyn_mod = load_reference_dynamics()
    torch.manual_seed(0)
    rng = np.random.default_rng(1)
    lig_x = torch.tensor(rng.normal(size=(NL, 3)) * 2, dtype=torch.float32)
    lig_h = torch.tensor(rng.normal(size=(NL, ATOM_NF)), dtype=torch.float32)
    kp_x = torch.tensor(rng.normal(size=(NK, 3)) * 3, dtype=torch.float32)
    kp_h = torch.tensor(rng.normal(size=(NK, REC_NF)), dtype=torch.float32)

    outs = []
    for writeback in (False, True):
        torch.manual_seed(7)
        dyn = ref_dyn_mod.LigRecDynamics(
            atom_nf=ATOM_NF, rec_nf=REC_NF, n_layers=N_LAYERS, hidden_nf=HID,
            use_tanh=True, message_norm=0, n_keypoints=NK,
            graph_cutoffs={"ll": LL_CUT, "kl": 8.0}, update_kp_feat=True,
            norm=True, ll_k=0, kl_k=KL_K,
        )
        g = _build_graph(lig_x, lig_h, kp_x, kp_h, writeback)
        with torch.no_grad():
            eps_h, eps_x = dyn(
                g, torch.tensor([0.5]),
                {"lig": torch.zeros(NL, dtype=torch.long),
                 "kp": torch.zeros(NK, dtype=torch.long)},
            )
        outs.append((eps_h.numpy(), eps_x.numpy()))

    assert not np.allclose(outs[0][0], outs[1][0])
    assert not np.allclose(outs[0][1], outs[1][1])
