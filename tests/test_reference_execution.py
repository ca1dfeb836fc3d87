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
