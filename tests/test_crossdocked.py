"""CrossDocked processing pipeline on a synthetic pocket-pdb + ligand-sdf pair."""
import pickle

import numpy as np

from kpdiff_tpu.cli.process_crossdocked import main as proc_main
from kpdiff_tpu.data.dataset import ComplexDataset
from kpdiff_tpu.data.pdb import format_pdb_line
from kpdiff_tpu.data.sdf import SdfMol, write_sdf


def test_process_crossdocked(tmp_path):
    rng = np.random.default_rng(0)
    data_dir = tmp_path / "cd"
    data_dir.mkdir()

    lig_center = np.array([5.0, 5.0, 5.0])
    lines = []
    serial = 1
    for res in range(8):
        d = rng.normal(size=3)
        d /= np.linalg.norm(d)
        base = lig_center + d * rng.uniform(4, 7)
        for name, el in [("N", "N"), ("CA", "C"), ("C", "C"), ("O", "O")]:
            x, y, z = base + rng.normal(scale=0.5, size=3)
            lines.append(format_pdb_line(serial, name, "ALA", "A", res + 1, x, y, z, el))
            serial += 1
    (data_dir / "pocket1.pdb").write_text("\n".join(lines) + "\nEND\n")

    n = 10
    pos = lig_center + np.cumsum(rng.normal(scale=0.1, size=(n, 3)) + np.array([1.4, 0.1, 0]), axis=0)
    pos -= pos.mean(0) - lig_center
    mol = SdfMol(title="l", elements=["C"] * n, coords=pos.astype(np.float32),
                 bonds=[(i, i + 1, 1) for i in range(n - 1)])
    write_sdf([mol], data_dir / "lig1.sdf")

    index = {"train": [("pocket1.pdb", "lig1.sdf")], "test": [("pocket1.pdb", "lig1.sdf")]}
    with open(tmp_path / "index.pkl", "wb") as f:
        pickle.dump(index, f)

    out = tmp_path / "processed"
    proc_main([
        "--data_dir", str(data_dir), "--index_file", str(tmp_path / "index.pkl"),
        "--out", str(out), "--min_ligand_atoms", "5",
    ])

    ds = ComplexDataset.from_pickle(out / "train.pkl")
    assert len(ds) == 1
    item = ds.get(0)
    assert item["lig_pos"].shape == (10, 3)
    assert item["rec_pos"].shape[0] > 0
    assert (out / "test.pkl").exists()
    assert (out / "train_n_node_joint_dist.pkl").exists()
