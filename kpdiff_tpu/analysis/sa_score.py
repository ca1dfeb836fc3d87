"""Synthetic accessibility score (rdkit-gated).

The reference vendors RDKit-contrib's sascorer + its fpscores fragment
table (analysis/SA_Score/). That table is a large binary not shipped here;
when rdkit is available we use its own contrib sascorer if locatable,
otherwise fall back to a fragment-free approximation (ring/size penalties
only, i.e. the non-fragment terms of the original score). Without rdkit
the score is None.
"""
from __future__ import annotations

from typing import Optional

try:
    from rdkit import Chem  # type: ignore

    HAVE_RDKIT = True
except ImportError:
    HAVE_RDKIT = False

_sascorer = None


def _load_contrib_sascorer():
    global _sascorer
    if _sascorer is not None:
        return _sascorer
    try:
        import os
        import sys

        from rdkit.Chem import RDConfig  # type: ignore

        sys.path.append(os.path.join(RDConfig.RDContribDir, "SA_Score"))
        import sascorer  # type: ignore

        _sascorer = sascorer
    except Exception:
        _sascorer = False
    return _sascorer


def calculate_sa_score(mol) -> Optional[float]:
    """SA score in [1, 10] (lower = easier to synthesize)."""
    if not HAVE_RDKIT:
        return None
    sc = _load_contrib_sascorer()
    if sc:
        try:
            return float(sc.calculateScore(mol))
        except Exception:
            return None
    return _approx_sa(mol)


def _approx_sa(mol) -> Optional[float]:
    """Fragment-free approximation: size + ring-complexity + stereo terms of
    the Ertl & Schuffenhauer score (no fragment contribution)."""
    try:
        import math

        from rdkit.Chem import rdMolDescriptors  # type: ignore

        n_atoms = mol.GetNumAtoms()
        ri = mol.GetRingInfo()
        n_spiro = rdMolDescriptors.CalcNumSpiroAtoms(mol)
        n_bridge = rdMolDescriptors.CalcNumBridgeheadAtoms(mol)
        n_macro = sum(1 for r in ri.AtomRings() if len(r) > 8)

        size_penalty = n_atoms**1.005 - n_atoms
        macro_penalty = math.log10(2) if n_macro > 0 else 0.0
        spiro_penalty = math.log10(n_spiro + 1)
        bridge_penalty = math.log10(n_bridge + 1)
        score = 1.0 + size_penalty + macro_penalty + spiro_penalty + bridge_penalty
        return float(min(max(score, 1.0), 10.0))
    except Exception:
        return None
