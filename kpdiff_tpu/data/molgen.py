"""Molecule-like synthetic data: learnable ligand structure.

`synthetic_dataset` (dataset.py) draws ligand atoms from an isotropic
Gaussian — fine for throughput benchmarks, useless for demonstrating that
training *works*, because there is no structure to learn. This module
generates ligands that look like small molecules to the first-party
chemistry stack (analysis/molecule_builder.py):

  * atom types drawn from a drug-like element distribution (mostly C,
    some N/O, traces of S/P/halogens) — so a trained model's atom-type
    KL vs. the training distribution is a meaningful metric
    (reference analysis/metrics.py:211-236);
  * connected tree topology with bond lengths at covalent-radii sums and
    heavy-atom valence limits respected — so validity / connectivity /
    atom-stability of *samples* (reference analysis/metrics.py:102-206)
    improve as the model learns the geometry;
  * pocket atoms on a protein-density (min_sep 1.8 Å) shell around the
    ligand, same receptor statistics as models/complex.py.

Generated molecules score validity == connectivity == 1.0 under
molecule_builder.perceive_bonds (asserted in tests/test_molgen.py), i.e.
they sit at the optimum of the metrics the in-training ModelAnalyzer
tracks — training on them moves those metrics toward 1.0 from the
untrained model's noise-cloud baseline.
"""
from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from kpdiff_tpu.analysis.molecule_builder import COVALENT_RADII

# Heavy-atom degree limits for tree growth: hydrogens are implicit (the
# reference strips them, process_bindingmoad.py remove_hydrogen), so heavy
# degree is below full valence for most elements.
_HEAVY_DEGREE = {
    "C": 4, "N": 3, "O": 2, "S": 2, "P": 4, "F": 1, "Cl": 1, "Br": 1,
    "I": 1, "B": 3,
}

# Drug-like heavy-atom element frequencies (order-independent; renormalized
# over whatever subset the config's lig_elements names).
_ELEMENT_FREQ = {
    "C": 0.712, "N": 0.118, "O": 0.131, "S": 0.016, "P": 0.004,
    "F": 0.009, "Cl": 0.007, "Br": 0.002, "I": 0.0005, "B": 0.0005,
}


def element_probs(element_list: Sequence[str]) -> np.ndarray:
    p = np.array([_ELEMENT_FREQ.get(e, 0.001) for e in element_list], float)
    return p / p.sum()


def random_molecule(
    rng: np.random.Generator,
    n_atoms: int,
    element_list: Sequence[str],
    n_dir_candidates: int = 48,
) -> Tuple[np.ndarray, np.ndarray]:
    """Grow a random tree molecule; returns (coords (n,3) f32, type_idx (n,) i32).

    Placement guarantees every non-bonded pair is separated by more than its
    covalent-bond detection threshold (r_i + r_j + 0.45 + margin), so
    perceive_bonds recovers exactly the constructed tree: the generated
    distribution sits at validity = connectivity = 1.0.
    """
    probs = element_probs(element_list)
    deg_cap = np.array([_HEAVY_DEGREE.get(e, 3) for e in element_list])
    radii = np.array([COVALENT_RADII.get(e, 0.76) for e in element_list])

    # first atom: force a chain-capable element (C if present)
    first = element_list.index("C") if "C" in element_list else int(np.argmax(deg_cap))
    types = [first]
    coords = [np.zeros(3)]
    degree = [0]

    while len(types) < n_atoms:
        # parent: any atom with spare heavy valence, biased toward the frontier
        spare = [i for i in range(len(types)) if degree[i] < deg_cap[types[i]]]
        if not spare:
            break  # fully saturated (possible only for tiny all-terminal draws)
        parent = int(rng.choice(spare[-8:] if rng.random() < 0.7 else spare))

        t_new = int(rng.choice(len(element_list), p=probs))
        if len(types) < n_atoms - 1 and deg_cap[t_new] < 2 and rng.random() < 0.5:
            # keep enough chain capacity: re-draw half the terminal picks
            t_new = first
        bond_len = radii[types[parent]] + radii[t_new] + rng.normal(0.0, 0.02)

        pos_parent = coords[parent]
        others = np.array([c for i, c in enumerate(coords) if i != parent]) if len(coords) > 1 else None
        placed = False
        for _ in range(4):  # candidate rounds
            dirs = rng.normal(size=(n_dir_candidates, 3))
            dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
            cand = pos_parent + dirs * bond_len
            if others is None:
                pick = cand[0]
                placed = True
                break
            d = np.linalg.norm(cand[:, None] - others[None], axis=-1)  # (K, n-1)
            thresh = radii[t_new] + np.array([radii[t] for i, t in enumerate(types) if i != parent]) + 0.55
            ok = (d > thresh[None]).all(axis=1)
            if ok.any():
                # among clash-free candidates prefer the most open placement
                score = np.where(ok, d.min(axis=1), -np.inf)
                pick = cand[int(np.argmax(score))]
                placed = True
                break
        if not placed:
            degree[parent] = deg_cap[types[parent]]  # crowded site: retire it
            continue
        coords.append(pick)
        types.append(t_new)
        degree.append(1)
        degree[parent] += 1

    x = np.asarray(coords, np.float32)
    x -= x.mean(0, keepdims=True)
    return x, np.asarray(types, np.int32)


def type_counts(dataset) -> np.ndarray:
    """Training-split atom-type histogram for the analyzer's KL metric
    (reference LigandTypeDistribution consumes the same counts)."""
    return np.asarray(dataset.lig_feat, np.float64).sum(axis=0)


def molgen_splits_for_config(config, pad, n_rec_feat, n_train: int, seed: int):
    """The train CLI's `--synthetic_mol` split recipe as a reusable helper.

    Benchmarks evaluating a demo run (strided_quality, trained-regime
    rooflines) must regenerate EXACTLY the distribution the run trained
    on — including the Cα-density geometry when the config's dataset is
    ca_only — or the quality metrics measure distribution shift instead
    of the model. Returns (train_ds, test_ds) with the CLI's seed
    convention (train = seed, test = seed + 1).
    """
    ds_cfg = config["dataset"]
    ca_only = bool(ds_cfg.get("ca_only", False))
    lig_range = (min(10, max(pad.n_lig // 2, 2)), min(32, pad.n_lig))
    # Cα-only pockets carry one node per residue — far fewer nodes at
    # ~3.8 Å spacing than all-atom shells
    rec_lo = min(48, pad.n_rec // 2) if ca_only else min(192, pad.n_rec // 2)
    kw = dict(lig_elements=ds_cfg["lig_elements"], n_rec_feat=n_rec_feat,
              lig_range=lig_range, rec_range=(rec_lo, pad.n_rec), ca_only=ca_only)
    train_ds = molecular_synthetic_dataset(n_train, seed=seed, **kw)
    test_ds = molecular_synthetic_dataset(max(n_train // 8, 4), seed=seed + 1, **kw)
    return train_ds, test_ds


def molecular_synthetic_dataset(
    n_complexes: int,
    seed: int,
    lig_elements: Sequence[str],
    n_rec_feat: int,
    lig_range: Tuple[int, int] = (10, 32),
    rec_range: Tuple[int, int] = (192, 384),
    min_sep: float = 1.8,
    ca_only: bool = False,
):
    """A ComplexDataset of molecule-like ligands in protein-density pockets.

    Same split schema as the BindingMOAD pickles (dataset.py:33-99); the
    receptor shell radius adapts to the ligand's extent so pockets wrap the
    molecule the way an 8 Å-cutoff extraction does
    (reference dataset.py pocket_cutoff).

    ca_only mirrors the reference's ca_only processing (one pocket node per
    residue Cα, process_bindingmoad.py --ca_only): nodes at Cα density
    (~3.8 Å nearest-neighbor spacing), 20-dim residue-type one-hots, and one
    residue index per node.
    """
    from kpdiff_tpu.data.dataset import ComplexDataset

    if ca_only:
        min_sep = 3.8  # Cα-Cα spacing along a backbone

    rng = np.random.default_rng(seed)
    lig_pos, lig_feat, rec_pos, rec_feat, res_idx, ips = [], [], [], [], [], []
    rec_seg, lig_seg, ip_seg = [0], [0], [0]

    rec_probs = element_probs([e for e in ("C", "N", "O", "S")])  # protein heavy atoms
    for _ in range(n_complexes):
        n_lig = int(rng.integers(lig_range[0], lig_range[1] + 1))
        x, t = random_molecule(rng, n_lig, lig_elements)
        n_lig = len(t)
        h = np.zeros((n_lig, len(lig_elements)), np.float32)
        h[np.arange(n_lig), t] = 1.0

        # pocket shell: jittered grid at protein density, band hugging the ligand
        r_lig = float(np.linalg.norm(x, axis=1).max()) if n_lig else 0.0
        lo_r, hi_r = r_lig + 1.5, r_lig + 7.0
        n_rec = int(rng.integers(rec_range[0], rec_range[1] + 1))
        axis = np.arange(-hi_r, hi_r, min_sep)
        gx, gy, gz = np.meshgrid(axis, axis, axis, indexing="ij")
        centers = np.stack([gx, gy, gz], -1).reshape(-1, 3)
        rnorm = np.linalg.norm(centers, axis=1)
        centers = centers[(rnorm > lo_r) & (rnorm < hi_r)]
        take = rng.choice(len(centers), size=min(n_rec, len(centers)), replace=False)
        # Cα spacing is tight around 3.8 Å — keep the jitter small enough
        # that grid neighbors cannot collapse below realistic separation
        jit = 0.08 if ca_only else 0.3
        rx = (centers[take] + rng.uniform(-jit, jit, (len(take), 3)) * min_sep).astype(np.float32)
        n_rec = len(rx)
        rh = np.zeros((n_rec, n_rec_feat), np.float32)
        if ca_only:
            # residue-type one-hots (20 AA types, config.py N_AA_TYPES)
            rh[np.arange(n_rec), rng.integers(0, n_rec_feat, size=n_rec)] = 1.0
        else:
            # protein pockets are C/N/O/S in the first 4 columns of the rec one-hot
            ridx = rng.choice(4, size=n_rec, p=rec_probs)
            rh[np.arange(n_rec), np.minimum(ridx, n_rec_feat - 1)] = 1.0

        if ca_only:
            # the reference's --ca_only processing emits NO interface points
            # (process_bindingmoad.py:193-198) and the ca configs pad n_ip=8;
            # generating them here both breaks that regime and silently drops
            # any complex whose ligand exceeds 16 atoms at pad_item
            n_ip = 0
            ip = np.zeros((0, 3), np.float32)
        else:
            n_ip = max(n_lig // 2, 2)
            li = rng.integers(0, n_lig, size=n_ip)
            d = np.linalg.norm(rx[None] - x[li][:, None], axis=-1)
            ri = d.argmin(1)
            ip = ((x[li] + rx[ri]) / 2).astype(np.float32)

        lig_pos.append(x)
        lig_feat.append(h)
        rec_pos.append(rx)
        rec_feat.append(rh)
        if ca_only:
            # one node per residue -> distinct residue index per Cα
            res_idx.append(np.arange(n_rec, dtype=np.int32))
        else:
            res_idx.append(np.sort(rng.integers(0, max(n_rec // 4, 1), size=n_rec)).astype(np.int32))
        ips.append(ip)
        rec_seg.append(rec_seg[-1] + n_rec)
        lig_seg.append(lig_seg[-1] + n_lig)
        ip_seg.append(ip_seg[-1] + n_ip)

    return ComplexDataset(
        lig_pos=np.concatenate(lig_pos),
        lig_feat=np.concatenate(lig_feat),
        rec_pos=np.concatenate(rec_pos),
        rec_feat=np.concatenate(rec_feat),
        rec_res_idx=np.concatenate(res_idx),
        interface_points=np.concatenate(ips),
        rec_segments=np.array(rec_seg),
        lig_segments=np.array(lig_seg),
        ip_segments=np.array(ip_seg),
    )
