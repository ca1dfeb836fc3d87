"""Regenerate the golden parity fixtures (tests/golden/*.npz).

Two fixture families, same format, both frozen so the parity tests run
torch-free (tests/test_golden_parity.py):

  * reimpl cases — the independent TORCH reimplementations of the
    reference modules on fixed inputs (intended 'intent' semantics);
  * refexec_* cases — the REFERENCE'S OWN modules executed through the
    first-party DGL emulation (tests/refexec.py), freezing the real
    executed semantics (z lost write + raw-dot attention — PARITY.md
    deviations 10-11, matched via the z_semantics/attn_semantics knobs
    in the stored configs).

    python -m tests.golden.generate
"""
from __future__ import annotations

import pathlib

import numpy as np
import torch
import jax

from tests.parity_jax import flatten_case

OUT = pathlib.Path(__file__).parent


def egnn_dynamics_case(message_norm):
    import tests.test_torch_parity as m

    torch.manual_seed(0)
    rng = np.random.default_rng(0)
    NL, NK = 7, 5
    lig_x = torch.tensor(rng.normal(size=(NL, 3)) * 2, dtype=torch.float32)
    lig_h = torch.tensor(rng.normal(size=(NL, m.ATOM_NF)), dtype=torch.float32)
    kp_x = torch.tensor(rng.normal(size=(NK, 3)) * 3, dtype=torch.float32)
    kp_h = torch.tensor(rng.normal(size=(NK, m.REC_NF)), dtype=torch.float32)
    t_val = 0.35

    ref = m.TorchRefDynamics(message_norm=message_norm)
    edges = m.build_edges(lig_x, kp_x)
    with torch.no_grad():
        eps_h_t, eps_x_t = ref(lig_x, lig_h, kp_x, kp_h, t_val, edges)

    from kpdiff_tpu.utils.torch_import import convert_egnn_dynamics_state_dict

    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = convert_egnn_dynamics_state_dict(
        sd, n_layers=m.N_LAYERS, update_kp_feat=True, rec_nf=m.REC_NF, hidden_nf=m.HID)

    meta = {
        "t_val": t_val, "kk_cut": m.KK_CUT, "rtol": 2e-4, "atol": 2e-5,
        "config": dict(
            atom_nf=m.ATOM_NF, rec_nf=m.REC_NF, n_timesteps=10, rec_encoder_type="fixed",
            graph_cutoffs={"rr": m.KK_CUT, "kk": m.KK_CUT, "kl": 8, "ll": m.LL_CUT, "rk": 100},
            dynamics=dict(n_layers=m.N_LAYERS, hidden_nf=m.HID, use_tanh=True,
                          message_norm=message_norm, update_kp_feat=True, norm=True,
                          ll_k=0, kl_k=m.KL_K),
        ),
    }
    return flatten_case(
        "egnn_dynamics", meta, params,
        {"lig_x": lig_x.numpy(), "lig_h": lig_h.numpy(), "kp_x": kp_x.numpy(), "kp_h": kp_h.numpy()},
        {"eps_h": eps_h_t.numpy(), "eps_x": eps_x_t.numpy()},
    )


def egnn_encoder_case():
    import tests.test_torch_parity_encoder as m

    torch.manual_seed(1)
    rng = np.random.default_rng(1)
    N = 14
    x0 = torch.tensor(rng.normal(size=(N, 3)) * 2.5, dtype=torch.float32)
    h0 = torch.tensor(rng.normal(size=(N, m.IN_F)), dtype=torch.float32)
    res_idx = torch.tensor(rng.integers(0, 4, size=N))

    ref = m.TorchRefEncoder()
    with torch.no_grad():
        kp_pos_t, kp_feat_t = ref(x0, h0, res_idx)

    from kpdiff_tpu.utils.torch_import import convert_egnn_encoder_state_dict

    sd = {k: v.numpy() for k, v in ref.state_dict().items()}
    params = convert_egnn_encoder_state_dict(
        sd, n_convs=m.N_CONVS, hidden=m.HID, out_feat=m.HID, in_feat=m.IN_F,
        use_sameres_feat=True, fix_pos=False, norm=True)

    meta = {
        "n_kp": m.N_KP, "kp_feat_dim": m.HID, "rtol": 5e-4, "atol": 5e-5,
        "config": dict(
            atom_nf=5, rec_nf=m.HID, n_timesteps=10, rec_encoder_type="learned",
            graph_cutoffs={"rr": m.RR_CUT, "rk": 100, "kk": 8, "kl": 8, "ll": 5},
            dynamics=dict(n_layers=1, hidden_nf=8, kl_k=2),
            rec_encoder=dict(
                n_keypoints=m.N_KP, in_n_node_feat=m.IN_F, hidden_n_node_feat=m.HID,
                out_n_node_feat=m.HID, n_convs=m.N_CONVS, use_tanh=True, message_norm=0,
                k_closest=m.K_CLOSEST, kp_rad=0.0, norm=True, fix_pos=False,
                use_sameres_feat=True),
        ),
    }
    return flatten_case(
        "egnn_encoder", meta, params,
        {"rec_x": x0.numpy(), "rec_h": h0.numpy(), "rec_res_idx": res_idx.numpy()},
        {"kp_x": kp_pos_t.numpy(), "kp_h": kp_feat_t.numpy()},
    )


def gvp_dynamics_case(message_norm):
    import tests.test_torch_parity_gvp as m

    torch.manual_seed(3)
    rng = np.random.default_rng(3)
    NL, NK = 7, 5
    lig_x = torch.tensor(rng.normal(size=(NL, 3)) * 2, dtype=torch.float32)
    lig_h = torch.tensor(rng.normal(size=(NL, m.ATOM_NF)), dtype=torch.float32)
    kp_x = torch.tensor(rng.normal(size=(NK, 3)) * 3, dtype=torch.float32)
    kp_h = torch.tensor(rng.normal(size=(NK, m.KP_NF)), dtype=torch.float32)
    kp_v = torch.tensor(rng.normal(size=(NK, m.V, 3)), dtype=torch.float32)
    t_val = 0.6

    ref = m.TorchRefGVPDynamics(message_norm=message_norm)
    edges = m.build_edges(lig_x, kp_x)
    with torch.no_grad():
        eps_h_t, eps_x_t = ref(lig_x, lig_h, kp_x, kp_h, kp_v, t_val, edges)

    from kpdiff_tpu.utils.torch_import import convert_gvp_dynamics_state_dict

    sd = {k: v.numpy() for k, v in ref.state_dict().items()}
    params = convert_gvp_dynamics_state_dict(
        sd, n_convs=m.N_CONVS, update_kp=True, n_message_gvps=m.N_MSG,
        n_update_gvps=m.N_UPD, n_noise_gvps=m.N_NOISE)

    meta = {
        "t_val": t_val, "kk_cut": m.KK_CUT, "rtol": 5e-4, "atol": 5e-5,
        "config": dict(
            atom_nf=m.ATOM_NF, rec_nf=m.KP_NF, n_timesteps=10, architecture="gvp",
            rec_encoder_type="fixed",
            graph_cutoffs={"rr": m.KK_CUT, "kk": m.KK_CUT, "kl": 8, "ll": m.LL_CUT, "rk": 100},
            rec_encoder=dict(vector_size=m.V),
            dynamics=dict(vector_size=m.V, n_convs=m.N_CONVS, n_hidden_scalars=m.S,
                          update_kp=True, message_norm=message_norm, ll_k=0, kl_k=m.KL_K,
                          n_message_gvps=m.N_MSG, n_update_gvps=m.N_UPD, n_noise_gvps=m.N_NOISE),
        ),
    }
    return flatten_case(
        "gvp_dynamics", meta, params,
        {"lig_x": lig_x.numpy(), "lig_h": lig_h.numpy(), "kp_x": kp_x.numpy(),
         "kp_h": kp_h.numpy(), "kp_v": kp_v.numpy()},
        {"eps_h": eps_h_t.numpy(), "eps_x": eps_x_t.numpy()},
    )


def gvp_encoder_case():
    import tests.test_torch_parity_gvp_encoder as m

    torch.manual_seed(5)
    rng = np.random.default_rng(5)
    N = 12
    x0 = torch.tensor(rng.normal(size=(N, 3)) * 2.5, dtype=torch.float32)
    h0 = torch.tensor(rng.normal(size=(N, m.IN_F)), dtype=torch.float32)

    ref = m.TorchRefGVPEncoder()
    with torch.no_grad():
        kp_pos_t, kp_h_t, kp_v_t = ref(x0, h0)

    from kpdiff_tpu.utils.torch_import import convert_gvp_encoder_state_dict

    sd = {k: v.numpy() for k, v in ref.state_dict().items()}
    params = convert_gvp_encoder_state_dict(sd, m.N_RR, m.N_RK, m.N_MSG, m.N_UPD)

    meta = {
        "n_kp": m.N_KP, "kp_feat_dim": m.S, "kp_vec_dim": m.V, "rtol": 5e-4, "atol": 1e-4,
        "config": dict(
            atom_nf=5, rec_nf=m.S, n_timesteps=10, architecture="gvp",
            rec_encoder_type="learned",
            graph_cutoffs={"rr": m.RR_CUT, "rk": m.RK_RBF_DMAX, "kk": 8, "kl": 8, "ll": 5},
            dynamics=dict(vector_size=m.V, n_convs=1, n_hidden_scalars=8, kl_k=2,
                          n_message_gvps=1, n_update_gvps=1, n_noise_gvps=2),
            rec_encoder=dict(
                in_scalar_size=m.IN_F, n_keypoints=m.N_KP, out_scalar_size=m.S,
                vector_size=m.V, n_rr_convs=m.N_RR, n_rk_convs=m.N_RK, message_norm=10.0,
                k_closest=m.K_CLOSEST, kp_rad=0, n_message_gvps=m.N_MSG,
                n_update_gvps=m.N_UPD, dropout=0.0),
        ),
    }
    return flatten_case(
        "gvp_encoder", meta, params,
        {"rec_x": x0.numpy(), "rec_h": h0.numpy()},
        {"kp_x": kp_pos_t.numpy(), "kp_h": kp_h_t.numpy(), "kp_v": kp_v_t.numpy()},
    )


# ---------------------------------------------------------------------------
# Cases generated from the REFERENCE'S OWN modules, executed through the
# first-party DGL emulation (tests/refexec.py). These freeze real-reference
# provenance (executed semantics: z lost write + raw-dot attention, PARITY.md
# deviations 10-11) so torch-free runs still check against the actual
# reference behavior, not just the reimplementations above.

def refexec_egnn_dynamics_case():
    import tests.test_reference_execution as m
    from tests.refexec import load_reference_dynamics

    mod = load_reference_dynamics()
    torch.manual_seed(0)
    rng = np.random.default_rng(0)
    lig_x = torch.tensor(rng.normal(size=(m.NL, 3)) * 2, dtype=torch.float32)
    lig_h = torch.tensor(rng.normal(size=(m.NL, m.ATOM_NF)), dtype=torch.float32)
    kp_x = torch.tensor(rng.normal(size=(m.NK, 3)) * 3, dtype=torch.float32)
    kp_h = torch.tensor(rng.normal(size=(m.NK, m.REC_NF)), dtype=torch.float32)
    t_val = 0.35

    dyn = mod.LigRecDynamics(
        atom_nf=m.ATOM_NF, rec_nf=m.REC_NF, n_layers=m.N_LAYERS, hidden_nf=m.HID,
        use_tanh=True, message_norm=0, n_keypoints=m.NK,
        graph_cutoffs={"ll": m.LL_CUT, "kl": 8.0}, update_kp_feat=True,
        norm=True, ll_k=0, kl_k=m.KL_K)
    g = m._build_graph(lig_x, lig_h, kp_x, kp_h, writeback=False)
    with torch.no_grad():
        eps_h_t, eps_x_t = dyn(g, torch.tensor([t_val]),
                               {"lig": torch.zeros(m.NL, dtype=torch.long),
                                "kp": torch.zeros(m.NK, dtype=torch.long)})

    from kpdiff_tpu.utils.torch_import import convert_egnn_dynamics_state_dict

    sd = {k: v.detach().numpy() for k, v in dyn.state_dict().items()}
    params = convert_egnn_dynamics_state_dict(
        sd, n_layers=m.N_LAYERS, update_kp_feat=True, rec_nf=m.REC_NF, hidden_nf=m.HID)

    meta = {
        "t_val": t_val, "kk_cut": m.KK_CUT, "rtol": 2e-4, "atol": 2e-5,
        "config": dict(
            atom_nf=m.ATOM_NF, rec_nf=m.REC_NF, n_timesteps=10, rec_encoder_type="fixed",
            graph_cutoffs={"rr": m.KK_CUT, "kk": m.KK_CUT, "kl": 8, "ll": m.LL_CUT, "rk": 100},
            dynamics=dict(n_layers=m.N_LAYERS, hidden_nf=m.HID, use_tanh=True,
                          message_norm=0, update_kp_feat=True, norm=True,
                          ll_k=0, kl_k=m.KL_K, z_semantics="executed"),
        ),
    }
    return flatten_case(
        "egnn_dynamics", meta, params,
        {"lig_x": lig_x.numpy(), "lig_h": lig_h.numpy(), "kp_x": kp_x.numpy(), "kp_h": kp_h.numpy()},
        {"eps_h": eps_h_t.numpy(), "eps_x": eps_x_t.numpy()},
    )


def refexec_egnn_encoder_case():
    import tests.test_reference_execution as m  # noqa: F401  (constants live in tpe)
    import tests.test_torch_parity_encoder as tpe
    from tests.refexec import HeteroGraphShim, load_reference_module, tc_radius_graph

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
        message_norm=0, kp_rad=0.0, k_closest=K_CLOSEST, norm=True, fix_pos=False)

    g = HeteroGraphShim(num_nodes={"rec": N, "kp": N_KP},
                        etypes={"rr": ("rec", "rec"), "rk": ("rec", "kp"), "kk": ("kp", "kp")})
    rr = tc_radius_graph(x0, RR_CUT, max_num_neighbors=N)
    g.add_edges(rr[0], rr[1], etype="rr")
    g.edges["rr"].data["same_res"] = (res_idx[rr[0]] == res_idx[rr[1]]).float()[:, None]
    g.add_edges(torch.arange(N).repeat(N_KP), torch.arange(N_KP).repeat_interleave(N), etype="rk")
    g.nodes["rec"].data["h_0"] = h0
    g.nodes["rec"].data["x_0"] = x0
    g.set_batch_num_nodes({"rec": torch.tensor([N]), "kp": torch.tensor([N_KP])})
    g.set_batch_num_edges({("rec", "rr", "rec"): torch.tensor([rr.shape[1]]),
                           ("rec", "rk", "kp"): torch.tensor([N * N_KP]),
                           ("kp", "kk", "kp"): torch.tensor([0])})
    with torch.no_grad():
        g_out = enc(g, {"rec": torch.zeros(N, dtype=torch.long),
                        "kp": torch.zeros(N_KP, dtype=torch.long)})

    from kpdiff_tpu.utils.torch_import import convert_egnn_encoder_state_dict

    sd = {k: v.detach().numpy() for k, v in enc.state_dict().items()}
    params = convert_egnn_encoder_state_dict(
        sd, n_convs=N_CONVS_E, hidden=HID, out_feat=HID, in_feat=IN_F,
        use_sameres_feat=True, fix_pos=False, norm=True)

    meta = {
        "n_kp": N_KP, "kp_feat_dim": HID, "rtol": 5e-4, "atol": 5e-5,
        "config": dict(
            atom_nf=5, rec_nf=HID, n_timesteps=10, rec_encoder_type="learned",
            graph_cutoffs={"rr": RR_CUT, "rk": 100, "kk": 8, "kl": 8, "ll": 5},
            dynamics=dict(n_layers=1, hidden_nf=8, kl_k=2),
            rec_encoder=dict(
                n_keypoints=N_KP, in_n_node_feat=IN_F, hidden_n_node_feat=HID,
                out_n_node_feat=HID, n_convs=N_CONVS_E, use_tanh=True, message_norm=0,
                k_closest=K_CLOSEST, kp_rad=0.0, norm=True, fix_pos=False,
                use_sameres_feat=True, attn_semantics="executed"),
        ),
    }
    del tpe
    return flatten_case(
        "egnn_encoder", meta, params,
        {"rec_x": x0.numpy(), "rec_h": h0.numpy(), "rec_res_idx": res_idx.numpy()},
        {"kp_x": g_out.nodes["kp"].data["x_0"].numpy(),
         "kp_h": g_out.nodes["kp"].data["h_0"].numpy()},
    )


def refexec_gvp_dynamics_case():
    import tests.test_reference_execution as m
    from tests.refexec import load_reference_gvp_dynamics

    mod = load_reference_gvp_dynamics()
    torch.manual_seed(3)
    rng = np.random.default_rng(3)
    lig_x = torch.tensor(rng.normal(size=(m.NL, 3)) * 2, dtype=torch.float32)
    lig_h = torch.tensor(rng.normal(size=(m.NL, m.ATOM_NF)), dtype=torch.float32)
    kp_x = torch.tensor(rng.normal(size=(m.NK, 3)) * 3, dtype=torch.float32)
    kp_h = torch.tensor(rng.normal(size=(m.NK, m.REC_NF)), dtype=torch.float32)
    kp_v = torch.tensor(rng.normal(size=(m.NK, m.GVP_V, 3)), dtype=torch.float32)
    t_val = 0.6

    dyn = mod.LigRecDynamicsGVP(
        n_lig_scalars=m.ATOM_NF, n_kp_scalars=m.REC_NF, vector_size=m.GVP_V,
        n_convs=m.N_CONVS, n_hidden_scalars=m.GVP_S, message_norm=10.0,
        graph_cutoffs={"ll": m.LL_CUT, "kl": 8.0}, update_kp=True, ll_k=0,
        kl_k=m.KL_K, n_message_gvps=m.N_MSG, n_update_gvps=m.N_UPD,
        n_noise_gvps=m.N_NOISE, dropout=0.0).eval()
    g = m._build_graph(lig_x, lig_h, kp_x, kp_h, writeback=False)
    g.nodes["kp"].data["v_0"] = kp_v
    with torch.no_grad():
        eps_h_t, eps_x_t = dyn(g, torch.tensor([t_val]),
                               {"lig": torch.zeros(m.NL, dtype=torch.long),
                                "kp": torch.zeros(m.NK, dtype=torch.long)})

    from kpdiff_tpu.utils.torch_import import convert_gvp_dynamics_state_dict

    sd = {k: v.detach().numpy() for k, v in dyn.state_dict().items()}
    params = convert_gvp_dynamics_state_dict(
        sd, n_convs=m.N_CONVS, update_kp=True, n_message_gvps=m.N_MSG,
        n_update_gvps=m.N_UPD, n_noise_gvps=m.N_NOISE)

    meta = {
        "t_val": t_val, "kk_cut": m.KK_CUT, "rtol": 5e-4, "atol": 5e-5,
        "config": dict(
            atom_nf=m.ATOM_NF, rec_nf=m.REC_NF, n_timesteps=10, architecture="gvp",
            rec_encoder_type="fixed",
            graph_cutoffs={"rr": m.KK_CUT, "kk": m.KK_CUT, "kl": 8, "ll": m.LL_CUT, "rk": 100},
            rec_encoder=dict(vector_size=m.GVP_V),
            dynamics=dict(vector_size=m.GVP_V, n_convs=m.N_CONVS, n_hidden_scalars=m.GVP_S,
                          update_kp=True, message_norm=10.0, ll_k=0, kl_k=m.KL_K,
                          n_message_gvps=m.N_MSG, n_update_gvps=m.N_UPD,
                          n_noise_gvps=m.N_NOISE),
        ),
    }
    return flatten_case(
        "gvp_dynamics", meta, params,
        {"lig_x": lig_x.numpy(), "lig_h": lig_h.numpy(), "kp_x": kp_x.numpy(),
         "kp_h": kp_h.numpy(), "kp_v": kp_v.numpy()},
        {"eps_h": eps_h_t.numpy(), "eps_x": eps_x_t.numpy()},
    )


def refexec_gvp_encoder_case():
    from tests.refexec import HeteroGraphShim, load_reference_module, tc_radius_graph

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
        graph_cutoffs={"rr": RR_CUT, "rk": RK_RBF_DMAX, "kk": 8.0}).eval()

    g = HeteroGraphShim(num_nodes={"rec": N, "kp": N_KP},
                        etypes={"rr": ("rec", "rec"), "rk": ("rec", "kp"), "kk": ("kp", "kp")})
    rr = tc_radius_graph(x0, RR_CUT, max_num_neighbors=N)
    g.add_edges(rr[0], rr[1], etype="rr")
    g.add_edges(torch.arange(N).repeat(N_KP), torch.arange(N_KP).repeat_interleave(N), etype="rk")
    g.nodes["rec"].data["h_0"] = h0
    g.nodes["rec"].data["x_0"] = x0
    g.set_batch_num_nodes({"rec": torch.tensor([N]), "kp": torch.tensor([N_KP])})
    g.set_batch_num_edges({("rec", "rr", "rec"): torch.tensor([rr.shape[1]]),
                           ("rec", "rk", "kp"): torch.tensor([N * N_KP]),
                           ("kp", "kk", "kp"): torch.tensor([0])})
    with torch.no_grad():
        g_out = enc(g, {"rec": torch.zeros(N, dtype=torch.long),
                        "kp": torch.zeros(N_KP, dtype=torch.long)})

    from kpdiff_tpu.utils.torch_import import convert_gvp_encoder_state_dict

    sd = {k: v.detach().numpy() for k, v in enc.state_dict().items()}
    params = convert_gvp_encoder_state_dict(sd, N_RR, N_RK, N_MSG, N_UPD)

    meta = {
        "n_kp": N_KP, "kp_feat_dim": S, "kp_vec_dim": V, "rtol": 5e-4, "atol": 1e-4,
        "config": dict(
            atom_nf=5, rec_nf=S, n_timesteps=10, architecture="gvp",
            rec_encoder_type="learned",
            graph_cutoffs={"rr": RR_CUT, "rk": RK_RBF_DMAX, "kk": 8, "kl": 8, "ll": 5},
            dynamics=dict(vector_size=V, n_convs=1, n_hidden_scalars=8, kl_k=2,
                          n_message_gvps=1, n_update_gvps=1, n_noise_gvps=2),
            rec_encoder=dict(
                in_scalar_size=IN_F, n_keypoints=N_KP, out_scalar_size=S,
                vector_size=V, n_rr_convs=N_RR, n_rk_convs=N_RK, message_norm=10.0,
                k_closest=K_CLOSEST, kp_rad=0, n_message_gvps=N_MSG,
                n_update_gvps=N_UPD, dropout=0.0, attn_semantics="executed"),
        ),
    }
    return flatten_case(
        "gvp_encoder", meta, params,
        {"rec_x": x0.numpy(), "rec_h": h0.numpy()},
        {"kp_x": g_out.nodes["kp"].data["x_0"].numpy(),
         "kp_h": g_out.nodes["kp"].data["h_0"].numpy(),
         "kp_v": g_out.nodes["kp"].data["v_0"].numpy()},
    )


def main():
    # whole-chain cases (reference KeypointDiffusion end-to-end through the
    # shim on injected noise — see tests/test_reference_chain.py)
    from tests.test_reference_chain import CHAIN_BUILDERS

    cases = {
        "egnn_dynamics_mn1": egnn_dynamics_case(1.0),
        "egnn_dynamics_mn0": egnn_dynamics_case(0),
        "egnn_encoder": egnn_encoder_case(),
        "gvp_dynamics_mean": gvp_dynamics_case("mean"),
        "gvp_dynamics_mn10": gvp_dynamics_case(10.0),
        "gvp_encoder": gvp_encoder_case(),
        "refexec_egnn_dynamics_mn0_executed": refexec_egnn_dynamics_case(),
        "refexec_egnn_encoder_executed": refexec_egnn_encoder_case(),
        "refexec_gvp_dynamics_mn10": refexec_gvp_dynamics_case(),
        "refexec_gvp_encoder_executed": refexec_gvp_encoder_case(),
    }
    for name, builder in CHAIN_BUILDERS.items():
        cases[name] = builder()
    for name, case in cases.items():
        path = OUT / f"{name}.npz"
        np.savez_compressed(path, **case)
        print(f"wrote {path} ({len(case)} arrays)")


if __name__ == "__main__":
    main()
