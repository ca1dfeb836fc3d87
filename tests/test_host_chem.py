"""Host chemistry: PDB/SDF parsing, pocket extraction, interface points,
bond perception, metrics, ligand size distribution."""
import numpy as np
import pytest

from kpdiff_tpu.analysis.metrics import atom_type_kl, evaluate_samples
from kpdiff_tpu.analysis.molecule_builder import build_molecule, canonical_key, perceive_bonds
from kpdiff_tpu.data.pdb import parse_pdb, write_pdb, write_xyz
from kpdiff_tpu.data.pocket import (
    InterfacePointException,
    featurize_atoms,
    get_interface_points,
    get_pocket_atoms,
    make_element_map,
)
from kpdiff_tpu.data.sdf import SdfMol, parse_sdf, write_sdf

PDB_SNIPPET = """\
ATOM      1  N   MET A   1      10.000  10.000  10.000  1.00  0.00           N
ATOM      2  CA  MET A   1      11.000  10.000  10.000  1.00  0.00           C
ATOM      3  C   MET A   1      12.000  10.500  10.000  1.00  0.00           C
ATOM      4  H   MET A   1      10.000   9.000  10.000  1.00  0.00           H
ATOM      5  N   ALA A   2      30.000  30.000  30.000  1.00  0.00           N
ATOM      6  CA  ALA A   2      31.000  30.000  30.000  1.00  0.00           C
HETATM    7  O   HOH A 101      15.000  15.000  15.000  1.00  0.00           O
HETATM    8 CL   LIG A 201      13.000  11.000  10.000  1.00  0.00          CL
END
"""


def test_parse_pdb(tmp_path):
    p = tmp_path / "x.pdb"
    p.write_text(PDB_SNIPPET)
    atoms = parse_pdb(p, remove_hydrogen=True, remove_water=True)
    assert len(atoms) == 6  # water + H removed
    assert atoms.element[:3] == ["N", "C", "C"]
    assert atoms.element[-1] == "Cl"
    assert atoms.res_index[0] == atoms.res_index[1] == atoms.res_index[2]
    assert atoms.res_index[3] != atoms.res_index[0]
    # roundtrip write
    out = tmp_path / "y.pdb"
    write_pdb(atoms, out)
    again = parse_pdb(out)
    assert len(again) == 6
    np.testing.assert_allclose(again.coords, atoms.coords, atol=1e-3)


def test_sdf_roundtrip(tmp_path):
    mol = SdfMol(
        title="test",
        elements=["C", "C", "O"],
        coords=np.array([[0, 0, 0], [1.5, 0, 0], [2.2, 1.1, 0]], np.float32),
        bonds=[(0, 1, 1), (1, 2, 2)],
    )
    path = tmp_path / "m.sdf"
    write_sdf([mol, mol], path)
    mols = parse_sdf(path)
    assert len(mols) == 2
    assert mols[0].elements == ["C", "C", "O"]
    assert mols[0].bonds == [(0, 1, 1), (1, 2, 2)]
    np.testing.assert_allclose(mols[0].coords, mol.coords, atol=1e-4)
    assert mols[0].without_hydrogens().n_atoms == 3


def test_pocket_extraction_by_residue():
    emap = make_element_map(["C", "N", "O"])
    # residue 0 near ligand, residue 1 far
    rec_coords = np.array([[0, 0, 0], [1, 0, 0], [50, 0, 0], [51, 0, 0]], float)
    rec_elements = ["C", "N", "C", "O"]
    res_idx = np.array([0, 0, 1, 1])
    lig = np.array([[0.0, 2.0, 0.0]])
    pc, pf, mask, ips = get_pocket_atoms(
        rec_coords, rec_elements, res_idx, lig, box_padding=8, pocket_cutoff=8, element_map=emap
    )
    assert pc.shape == (2, 3)
    assert mask.tolist() == [True, True, False, False]
    assert pf.shape == (2, 3)
    assert ips.shape[1] == 3


def test_interface_points_thinning():
    lig = np.zeros((1, 3))
    rec = np.array([[2.0, 0, 0], [2.1, 0, 0], [0, 2.0, 0]])
    pts = get_interface_points(lig, rec, distance_threshold=5, exclusion_threshold=2.0)
    # midpoints at (1,0,0),(1.05,0,0),(0,1,0): second excluded (<2 apart), third kept?
    # dist((1,0,0),(0,1,0)) = sqrt(2) < 2 -> excluded too
    assert pts.shape == (1, 3)


def test_featurizer_other_class():
    emap = make_element_map(["C", "N"])
    feats, other = featurize_atoms(["C", "N", "Zn"], emap)
    assert feats.shape == (3, 2)
    assert other.tolist() == [False, False, True]


def test_bond_perception_ethanol_like():
    # C-C-O chain at typical bond lengths
    coords = np.array([[0, 0, 0], [1.52, 0, 0], [2.2, 1.2, 0]], float)
    bonds = perceive_bonds(coords, ["C", "C", "O"])
    pairs = {(a, b) for a, b, _ in bonds}
    assert (0, 1) in pairs and (1, 2) in pairs and (0, 2) not in pairs


def test_build_molecule_largest_fragment():
    coords = np.array([[0, 0, 0], [1.5, 0, 0], [50, 50, 50]], float)
    mol = build_molecule(coords, ["C", "C", "O"], largest_frag=True, sanitize=False)
    assert mol.n_atoms == 2
    assert mol.largest_frag_frac == pytest.approx(2 / 3)


def test_canonical_key_invariance():
    coords = np.array([[0, 0, 0], [1.5, 0, 0], [2.2, 1.2, 0]], float)
    m1 = build_molecule(coords, ["C", "C", "O"], sanitize=False)
    # same molecule, permuted atom order
    perm = [2, 0, 1]
    m2 = build_molecule(coords[perm], [["C", "C", "O"][i] for i in perm], sanitize=False)
    assert canonical_key(m1) == canonical_key(m2)
    m3 = build_molecule(coords, ["C", "C", "N"], sanitize=False)
    assert canonical_key(m1) != canonical_key(m3)


def test_evaluate_samples_block():
    rng = np.random.default_rng(0)
    positions, elements = [], []
    for _ in range(10):
        n = rng.integers(4, 9)
        # chain of carbons at 1.5 A
        pos = np.cumsum(rng.normal(scale=0.1, size=(n, 3)) + np.array([1.5, 0, 0]), axis=0)
        positions.append(pos)
        elements.append(["C"] * n)
    out = evaluate_samples(positions, elements, element_list=["C", "N", "O"], train_type_counts=np.array([100, 10, 10]))
    assert 0 <= out["validity"] <= 1
    assert out["connectivity"] == 1.0
    assert out["atom_type_kl"] > 0


def test_ligand_size_distribution_reference_artifact():
    from kpdiff_tpu.models.size_dist import LigandSizeDistribution

    d = LigandSizeDistribution("/root/reference/data/bindingmoad_processed")
    sizes = d.sample(np.array([100, 7, 661, 1000]), 5, np.random.default_rng(0))
    assert sizes.shape == (4, 5)
    assert (sizes >= d.lig_bounds[0]).all() and (sizes <= d.lig_bounds[1]).all()


def test_build_joint_histogram_roundtrip(tmp_path):
    from kpdiff_tpu.models.size_dist import LigandSizeDistribution, build_joint_histogram, save_joint_histogram

    rng = np.random.default_rng(1)
    rec = rng.integers(20, 50, 200)
    lig = rng.integers(5, 20, 200)
    h, rb, lb = build_joint_histogram(rec, lig)
    save_joint_histogram(tmp_path / "train_n_node_joint_dist.pkl", h, rb, lb)
    d = LigandSizeDistribution(tmp_path)
    s = d.sample(np.array([30]), 10)
    assert s.shape == (1, 10)


def test_write_xyz():
    s = write_xyz(np.array([[1.0, 2.0, 3.0]]), ["C"])
    assert s.startswith("1\n\nC 1.000 2.000 3.000")
