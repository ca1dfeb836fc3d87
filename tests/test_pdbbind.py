"""PDBbind legacy dataset (reference data_processing/pdbbind_dataset.py):
index-file driven processing into per-PDB artifacts + per-item access
compatible with PaddedLoader."""
import numpy as np
import pytest
import shutil

from tests.test_cli import _write_synthetic_complex_pdb_sdf


@pytest.fixture
def pdbbind_raw(tmp_path):
    raw = tmp_path / "raw"
    ids = []
    for i in range(3):
        pdb_id = f"1ab{i}"
        d = raw / pdb_id
        d.mkdir(parents=True)
        fix = tmp_path / f"fix{i}"
        fix.mkdir()
        pdb_path, sdf_path = _write_synthetic_complex_pdb_sdf(fix)
        shutil.copy(pdb_path, d / f"{pdb_id}_protein_nowater.pdb")
        shutil.copy(sdf_path, d / f"{pdb_id}_ligand.sdf")
        ids.append(pdb_id)
    # one broken entry that must be skipped, not crash (reference-style)
    bad = raw / "9bad"
    bad.mkdir()
    (bad / "9bad_protein_nowater.pdb").write_text("garbage\n")
    ids.append("9bad")
    index = tmp_path / "index.txt"
    index.write_text("\n".join(ids) + "\n")
    return index, raw, tmp_path / "processed"


def test_process_and_load(pdbbind_raw):
    from kpdiff_tpu.data.pdbbind import PDBbindDataset, process_pdbbind

    index, raw, processed = pdbbind_raw
    elements = ["C", "N", "O", "S"]
    done = process_pdbbind(index, raw, processed, elements, elements)
    assert len(done) == 3  # the broken entry is skipped

    ds = PDBbindDataset(processed)
    assert len(ds) == 3
    item = ds.get(0)
    assert item["lig_pos"].shape[1] == 3
    assert item["rec_feat"].shape[1] == len(elements)  # pipeline convention: others dropped
    assert item["interface_points"].shape[0] >= 2
    assert (item["rec_res_idx"] >= 0).all()

    # PaddedLoader consumes it unchanged
    from kpdiff_tpu.config import PaddingConfig
    from kpdiff_tpu.data.dataset import PaddedLoader

    pad = PaddingConfig(n_rec=64, n_lig=16, n_kp=4, n_ip=16)
    loader = PaddedLoader(ds, pad, batch_size=3, n_kp=4, kp_feat_dim=8)
    batches = list(loader.epoch())
    assert len(batches) == 1
    assert int(np.asarray(batches[0].lig_mask).sum(1).min()) > 0


def test_dataset_size_truncation(pdbbind_raw):
    from kpdiff_tpu.data.pdbbind import process_pdbbind

    index, raw, processed = pdbbind_raw
    done = process_pdbbind(index, raw, processed, ["C", "N", "O"], ["C", "N", "O"],
                           dataset_size=1)
    assert len(done) == 1


def test_unknown_element_atoms_do_not_break_res_index(tmp_path):
    """Regression: get_pocket_atoms filters 'other'-element atoms before
    building byres_mask; res_index must be filtered the same way (a ZN atom
    in the receptor previously raised IndexError and silently dropped the
    entry)."""
    from kpdiff_tpu.data.pdb import format_pdb_line
    from kpdiff_tpu.data.pdbbind import PDBbindDataset, process_pdbbind

    rng = np.random.default_rng(3)
    fix = tmp_path / "fix"
    fix.mkdir()
    pdb_path, sdf_path = _write_synthetic_complex_pdb_sdf(fix)
    # append a zinc ATOM record near the pocket (element outside rec_elements)
    lines = pdb_path.read_text().rstrip().splitlines()
    lines.insert(-1, format_pdb_line(999, "ZN", "ZN", "A", 99, 20.0, 20.0, 14.0, "Zn"))
    raw = tmp_path / "raw" / "1zzz"
    raw.mkdir(parents=True)
    (raw / "1zzz_protein_nowater.pdb").write_text("\n".join(lines) + "\n")
    import shutil

    shutil.copy(sdf_path, raw / "1zzz_ligand.sdf")
    (tmp_path / "index.txt").write_text("1zzz\n")

    done = process_pdbbind(tmp_path / "index.txt", tmp_path / "raw", tmp_path / "proc",
                           ["C", "N", "O", "S"], ["C", "N", "O", "S"])
    assert done == ["1zzz"]
    item = PDBbindDataset(tmp_path / "proc").get(0)
    assert item["rec_res_idx"].shape[0] == item["rec_pos"].shape[0]
