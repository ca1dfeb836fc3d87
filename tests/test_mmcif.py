"""mmCIF receptor input (data/mmcif.py) — reference byop.py:13,107-110
accepts .pdb and .mmcif receptors; parse parity against parse_pdb on the
same structure."""
from __future__ import annotations

import numpy as np

from kpdiff_tpu.data.mmcif import parse_mmcif, parse_structure
from kpdiff_tpu.data.pdb import format_pdb_line, parse_pdb


def _synthetic_structure(n_res=6, seed=0):
    rng = np.random.default_rng(seed)
    rows = []  # (group, name, element, resname, chain, resseq, xyz)
    for res in range(n_res):
        base = rng.uniform(0, 30, size=3)
        for name, el in [("N", "N"), ("CA", "C"), ("C", "C"), ("O", "O")]:
            rows.append(("ATOM", name, el, "ALA", "A", res + 1, base + rng.normal(scale=0.8, size=3)))
    # one water (filtered), one hetero ligand atom, one hydrogen (filterable)
    rows.append(("HETATM", "O", "O", "HOH", "A", 900, rng.uniform(0, 30, 3)))
    rows.append(("HETATM", "C1", "C", "LIG", "B", 901, rng.uniform(0, 30, 3)))
    rows.append(("ATOM", "H1", "H", "ALA", "A", 1, rng.uniform(0, 30, 3)))
    return rows


def _write_pdb(rows, path):
    lines = [
        format_pdb_line(i + 1, name, rn, ch, rs, *xyz, el, hetero=grp == "HETATM")
        for i, (grp, name, el, rn, ch, rs, xyz) in enumerate(rows)
    ]
    path.write_text("\n".join(lines) + "\nEND\n")


def _write_mmcif(rows, path, quote_some=True):
    head = """data_synthetic
#
_entry.id SYNTH
#
loop_
_atom_site.group_PDB
_atom_site.id
_atom_site.type_symbol
_atom_site.label_atom_id
_atom_site.label_alt_id
_atom_site.label_comp_id
_atom_site.label_asym_id
_atom_site.label_seq_id
_atom_site.pdbx_PDB_ins_code
_atom_site.Cartn_x
_atom_site.Cartn_y
_atom_site.Cartn_z
_atom_site.occupancy
_atom_site.B_iso_or_equiv
_atom_site.auth_seq_id
_atom_site.auth_comp_id
_atom_site.auth_asym_id
_atom_site.auth_atom_id
_atom_site.pdbx_PDB_model_num
"""
    body = []
    for i, (grp, name, el, rn, ch, rs, xyz) in enumerate(rows):
        nm = f'"{name}"' if quote_some and i % 3 == 0 else name
        x, y, z = xyz
        body.append(
            f"{grp} {i + 1} {el} {nm} . {rn} {ch} {rs} ? "
            f"{x:.3f} {y:.3f} {z:.3f} 1.00 0.00 {rs} {rn} {ch} {nm} 1"
        )
    path.write_text(head + "\n".join(body) + "\n#\n")


def test_mmcif_matches_pdb(tmp_path):
    rows = _synthetic_structure()
    pdb_path = tmp_path / "s.pdb"
    cif_path = tmp_path / "s.cif"
    _write_pdb(rows, pdb_path)
    _write_mmcif(rows, cif_path)

    a = parse_pdb(pdb_path, remove_hydrogen=True)
    b = parse_mmcif(cif_path, remove_hydrogen=True)
    assert len(a) == len(b)
    assert a.element == b.element
    assert a.resname == b.resname
    assert list(a.resseq) == list(b.resseq)
    assert list(a.res_index) == list(b.res_index)
    assert list(a.is_hetero) == list(b.is_hetero)
    np.testing.assert_allclose(a.coords, b.coords, atol=2e-3)

    # waters dropped, hydrogens dropped on request but kept otherwise
    keep_h = parse_mmcif(cif_path, remove_hydrogen=False)
    assert len(keep_h) == len(b) + 1
    assert "HOH" not in b.resname


def test_parse_structure_dispatch(tmp_path):
    rows = _synthetic_structure()
    for suffix in (".pdb", ".cif", ".mmcif"):
        p = tmp_path / f"s{suffix}"
        (_write_pdb if suffix == ".pdb" else _write_mmcif)(rows, p)
        atoms = parse_structure(p, remove_hydrogen=True)
        assert len(atoms) == len(rows) - 2  # minus water + hydrogen


def test_mmcif_multi_model_takes_first(tmp_path):
    rows = _synthetic_structure(n_res=2)
    cif_path = tmp_path / "m.cif"
    _write_mmcif(rows, cif_path, quote_some=False)
    # duplicate every row as model 2 — must be ignored
    text = cif_path.read_text()
    lines = text.rstrip("#\n").splitlines()
    data = [ln for ln in lines if ln and ln[0] not in "_#" and not ln.startswith(("data_", "loop_"))]
    model2 = [ln[: ln.rfind(" ")] + " 2" for ln in data]
    cif_path.write_text(text.rstrip("#\n") + "\n" + "\n".join(model2) + "\n#\n")
    a = parse_mmcif(cif_path)
    assert len(a) == len([r for r in rows if r[3] != "HOH"])


def test_mmcif_write_pdb_roundtrip(tmp_path):
    """mmCIF-sourced atoms can be written as pocket.pdb and re-parsed
    (the BYOP output path)."""
    from kpdiff_tpu.data.pdb import write_pdb

    rows = _synthetic_structure()
    cif_path = tmp_path / "s.cif"
    _write_mmcif(rows, cif_path)
    atoms = parse_mmcif(cif_path, remove_hydrogen=True)
    out = tmp_path / "pocket.pdb"
    write_pdb(atoms, out)
    back = parse_pdb(out)
    assert len(back) == len(atoms)
    np.testing.assert_allclose(back.coords, atoms.coords, atol=2e-3)
