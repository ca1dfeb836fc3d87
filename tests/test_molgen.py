"""Molecule-like synthetic data generator (data/molgen.py): the training
distribution must sit at the optimum of the analyzer metrics, otherwise the
trained-model demonstration (VERDICT r2 item 1) proves nothing."""
import numpy as np
import pytest

from kpdiff_tpu.analysis.metrics import evaluate_samples
from kpdiff_tpu.analysis.molecule_builder import perceive_bonds
from kpdiff_tpu.data.molgen import (
    element_probs,
    molecular_synthetic_dataset,
    random_molecule,
    type_counts,
)

ELEMS = ["C", "N", "O", "S", "P", "F", "Cl", "Br", "I", "B"]


def test_random_molecule_is_valid_and_connected():
    rng = np.random.default_rng(0)
    positions, elements = [], []
    for i in range(30):
        x, t = random_molecule(rng, int(rng.integers(8, 33)), ELEMS)
        assert len(t) >= 8
        positions.append(x)
        elements.append([ELEMS[j] for j in t])
    m = evaluate_samples(positions, elements, element_list=ELEMS)
    assert m["validity"] == 1.0
    assert m["connectivity"] == 1.0
    assert m["atom_validity"] == 1.0
    assert m["avg_frag_frac"] == 1.0


def test_perceived_bonds_form_spanning_tree():
    # placement margins guarantee bond perception recovers exactly n-1 bonds
    rng = np.random.default_rng(3)
    for _ in range(10):
        x, t = random_molecule(rng, 24, ELEMS)
        bonds = perceive_bonds(x, [ELEMS[j] for j in t])
        assert len(bonds) == len(t) - 1


def test_element_distribution_mostly_carbon():
    rng = np.random.default_rng(1)
    counts = np.zeros(len(ELEMS))
    for _ in range(40):
        _, t = random_molecule(rng, 30, ELEMS)
        counts += np.bincount(t, minlength=len(ELEMS))
    frac = counts / counts.sum()
    assert frac[0] > 0.55  # C dominates
    assert frac[1] > 0.03 and frac[2] > 0.03  # N, O present


def test_dataset_schema_and_padding():
    from kpdiff_tpu.config import PaddingConfig
    from kpdiff_tpu.data.dataset import pad_item

    ds = molecular_synthetic_dataset(8, seed=0, lig_elements=ELEMS, n_rec_feat=10,
                                     lig_range=(10, 24), rec_range=(96, 192))
    assert len(ds) == 8
    pad = PaddingConfig(n_rec=384, n_lig=32, n_ip=32)
    for i in range(8):
        item = ds.get(i)
        assert item["lig_pos"].shape[0] == item["lig_feat"].shape[0]
        assert item["rec_pos"].shape[0] >= 96
        # pocket shell wraps the ligand: no receptor atom inside the molecule
        dmin = np.linalg.norm(
            item["rec_pos"][:, None] - item["lig_pos"][None], axis=-1).min()
        assert dmin > 1.0
        out = pad_item(item, pad)
        assert out is not None and out["lig_mask"].sum() == item["lig_pos"].shape[0]

    tc = type_counts(ds)
    assert tc.sum() > 0 and tc[0] == tc.max()  # carbon-dominated


def test_probs_normalized_over_subset():
    p = element_probs(["C", "N", "O"])
    assert abs(p.sum() - 1) < 1e-12 and p[0] > 0.5


def test_molgen_splits_for_config_ca_only():
    """The shared split helper (used by the train CLI and the trained-run
    benchmarks) must propagate the config's ca_only flag and the CLI seed
    convention (train = seed, test = seed + 1)."""
    from kpdiff_tpu.data.molgen import molgen_splits_for_config

    class Pad:
        n_rec, n_lig = 128, 48

    cfg = {"dataset": {"ca_only": True, "lig_elements": ELEMS}}
    train_ds, test_ds = molgen_splits_for_config(cfg, Pad, 20, 16, seed=42)
    assert len(train_ds) == 16 and len(test_ds) == 4
    for ds in (train_ds, test_ds):
        rx = ds.get(0)["rec_pos"]
        d = np.linalg.norm(rx[:, None] - rx[None], axis=-1)
        np.fill_diagonal(d, np.inf)
        assert d.min() > 3.0  # ca_only reached the generator
    # same recipe, same seeds -> reproducible split
    again, _ = molgen_splits_for_config(cfg, Pad, 20, 16, seed=42)
    np.testing.assert_array_equal(again.get(0)["lig_pos"], train_ds.get(0)["lig_pos"])


def test_ca_only_dataset():
    """ca_only mirrors the reference's Cα processing: one node per residue
    (distinct res_idx), ~3.8 Å nearest-neighbor spacing, residue-type
    one-hots over the 20 AA channels."""
    ds = molecular_synthetic_dataset(6, seed=3, lig_elements=ELEMS, n_rec_feat=20,
                                     lig_range=(8, 16), rec_range=(48, 128),
                                     ca_only=True)
    for i in range(6):
        item = ds.get(i)
        rx = item["rec_pos"]
        assert rx.shape[0] >= 30
        d = np.linalg.norm(rx[:, None] - rx[None], axis=-1)
        np.fill_diagonal(d, np.inf)
        assert d.min() > 3.0  # Cα density, not all-atom density
        rh = item["rec_feat"]
        assert rh.shape[1] == 20
        assert (rh.sum(1) == 1).all() and set(rh.argmax(1)) != {0}
        ri = item["rec_res_idx"]
        assert len(np.unique(ri)) == len(ri)  # one residue per node


def test_ca_only_fits_reference_ca_padding():
    """ca_only emits NO interface points (process_bindingmoad.py:193-198
    regime) so every complex fits the shipped ca configs' n_ip=8 padding —
    the buggy version silently dropped 60% of a split at pad_item."""
    import yaml

    from kpdiff_tpu.config import PaddingConfig, load_config, resolve_feature_sizes
    from kpdiff_tpu.data.dataset import pad_item
    from kpdiff_tpu.data.molgen import molgen_splits_for_config

    config = load_config("configs/egnn_ca.yml")
    pad = PaddingConfig.from_config(config)
    n_rec_feat, n_lig_feat, _ = resolve_feature_sizes(config)
    train_ds, test_ds = molgen_splits_for_config(config, pad, n_rec_feat, 64, 42)
    for ds in (train_ds, test_ds):
        for i in range(len(ds)):
            item = ds.get(i)
            assert item["interface_points"].shape == (0, 3)
            assert pad_item(item, pad, n_lig_feat_out=n_lig_feat) is not None
