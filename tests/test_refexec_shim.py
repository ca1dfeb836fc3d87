"""Unit tests for the DGL-emulation shim itself (tests/refexec.py) — the
foundation under the reference-execution parity suite. Fast (no jax)."""
import numpy as np
import torch

from tests.refexec import (
    HeteroGraphShim,
    _feat_mul,
    _make_fn_module,
    segment_csr,
    tc_knn,
    tc_knn_graph,
    tc_radius,
    tc_radius_graph,
)

fn = _make_fn_module()


def _bipartite(n_src=5, n_dst=3):
    g = HeteroGraphShim(num_nodes={"a": n_src, "b": n_dst},
                        etypes={"ab": ("a", "b")})
    return g


def test_feat_mul_broadcasts_feature_shapes():
    a = torch.arange(6, dtype=torch.float32).reshape(2, 3)        # (E,3)
    b = torch.tensor([[[2.0]], [[3.0]]])                          # (E,1,1)
    out = _feat_mul(a, b)
    assert out.shape == (2, 1, 3)
    assert torch.allclose(out[0, 0], a[0] * 2)
    assert torch.allclose(out[1, 0], a[1] * 3)


def test_update_all_sum_and_mean():
    g = _bipartite()
    g.add_edges(torch.tensor([0, 1, 2, 3]), torch.tensor([0, 0, 2, 2]), etype="ab")
    g.nodes["a"].data["h"] = torch.arange(5, dtype=torch.float32)[:, None]
    g.update_all(fn.copy_u("h", "m"), fn.sum("m", "s"), etype="ab")
    assert torch.allclose(g.nodes["b"].data["s"][:, 0], torch.tensor([1.0, 0.0, 5.0]))
    g.update_all(fn.copy_u("h", "m"), fn.mean("m", "mn"), etype="ab")
    assert torch.allclose(g.nodes["b"].data["mn"][:, 0], torch.tensor([0.5, 0.0, 2.5]))


def test_custom_mailbox_reduce_orders_by_edge_insertion():
    g = _bipartite()
    # dst 0 gets edges in insertion order (src 2 then 0); dst 1 gets (1, 3)
    g.add_edges(torch.tensor([2, 1, 0, 3]), torch.tensor([0, 1, 0, 1]), etype="ab")
    g.nodes["a"].data["h"] = torch.arange(5, dtype=torch.float32)[:, None]

    def collect(nodes):
        return {"k": nodes.mailbox["m"][..., 0]}

    g.update_all(fn.copy_u("h", "m"), collect, etype="ab")
    out = g.nodes["b"].data["k"]
    assert torch.allclose(out[0], torch.tensor([2.0, 0.0]))
    assert torch.allclose(out[1], torch.tensor([1.0, 3.0]))


def test_ndata_plain_dict_vs_writeback():
    for writeback, expect in [(False, 1.0), (True, 2.0)]:
        g = HeteroGraphShim(num_nodes={"a": 2}, etypes={"aa": ("a", "a")},
                            ndata_writeback=writeback)
        g.nodes["a"].data["h"] = torch.ones(2, 1)
        view = g.ndata["h"]
        view["a"] = view["a"] * 2  # the reference's dynamics.py:188-192 pattern
        assert float(g.ndata["h"]["a"][0, 0]) == expect


def test_local_scope_restores_data_not_structure():
    g = _bipartite()
    g.nodes["a"].data["h"] = torch.zeros(5, 1)
    with g.local_scope():
        g.nodes["a"].data["h"] = torch.ones(5, 1)
        g.add_edges(torch.tensor([0]), torch.tensor([0]), etype="ab")
    assert float(g.nodes["a"].data["h"].sum()) == 0.0  # data restored
    assert g.edges(form="eid", etype="ab").shape[0] == 1  # structure kept


def test_add_edges_zero_pads_existing_edata():
    g = _bipartite()
    g.add_edges(torch.tensor([0, 1]), torch.tensor([0, 1]), etype="ab")
    g.edges["ab"].data["w"] = torch.ones(2, 4)
    g.add_edges(torch.tensor([2]), torch.tensor([2]), etype="ab")
    w = g.edges["ab"].data["w"]
    assert w.shape == (3, 4) and float(w[2].abs().sum()) == 0.0


def test_remove_edges_filters_edata_rows():
    g = _bipartite()
    g.add_edges(torch.tensor([0, 1, 2]), torch.tensor([0, 1, 2]), etype="ab")
    g.edges["ab"].data["w"] = torch.tensor([[1.0], [2.0], [3.0]])
    g.remove_edges(torch.tensor([1]), etype="ab")
    assert torch.allclose(g.edges["ab"].data["w"][:, 0], torch.tensor([1.0, 3.0]))


def test_segment_csr_matches_manual():
    src = torch.arange(6, dtype=torch.float32)[:, None]
    out = segment_csr(src, torch.tensor([0, 2, 2, 6]))
    assert torch.allclose(out[:, 0], torch.tensor([1.0, 0.0, 14.0]))


def test_torch_cluster_semantics():
    rng = np.random.default_rng(0)
    x = torch.tensor(rng.normal(size=(6, 3)), dtype=torch.float32)
    y = torch.tensor(rng.normal(size=(2, 3)), dtype=torch.float32)

    # knn(x, y, k): row0 = y idx, row1 = x idx, k nearest per y, by distance
    e = tc_knn(x, y, 2)
    assert e.shape == (2, 4)
    for i in range(2):
        d = torch.linalg.vector_norm(x - y[i], dim=1)
        expect = set(torch.argsort(d)[:2].tolist())
        got = set(e[1][e[0] == i].tolist())
        assert got == expect

    # knn_graph: no self loops, edge_index[0]=neighbor, [1]=center
    e = tc_knn_graph(x, 2)
    assert (e[0] != e[1]).all()
    assert e.shape[1] == 12

    # radius/radius_graph: strictly-within-r pair sets
    e = tc_radius(x, y, 1.5)
    for c in range(e.shape[1]):
        assert float(torch.linalg.vector_norm(x[e[1, c]] - y[e[0, c]])) < 1.5
    e = tc_radius_graph(x, 1.5)
    pairs = {(int(a), int(b)) for a, b in zip(e[0], e[1])}
    assert all((b, a) in pairs for (a, b) in pairs)  # symmetric set


def test_batch_bookkeeping_accepts_string_and_canonical():
    g = _bipartite()
    g.set_batch_num_edges({("a", "ab", "b"): torch.tensor([7])})
    assert int(g.batch_num_edges("ab")[0]) == 7
    assert int(g.batch_num_edges(("a", "ab", "b"))[0]) == 7
