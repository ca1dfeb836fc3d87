"""PaddedComplex — the fixed-shape replacement for the reference's
3-node-type DGL heterograph (SURVEY.md §1.1; reference
data_processing/pdbbind_processing.py:221-274).

All arrays carry a static batch dim B and static per-type node capacities.
Validity is tracked with boolean masks; "removing" nodes (fake atoms,
FixedReceptorEncoder deleting rec) is a mask update, never a reshape —
this is what makes every model step jit-compilable with one shape.
"""
from __future__ import annotations

from typing import Optional

import flax.struct
import jax.numpy as jnp
import numpy as np


@flax.struct.dataclass
class PaddedComplex:
    # pocket atoms
    rec_x: jnp.ndarray  # (B, Nr, 3)
    rec_h: jnp.ndarray  # (B, Nr, Fr)
    rec_mask: jnp.ndarray  # (B, Nr) bool
    rec_res_idx: jnp.ndarray  # (B, Nr) int32 — residue index for same_res rr feature
    # ligand atoms
    lig_x: jnp.ndarray  # (B, Nl, 3)
    lig_h: jnp.ndarray  # (B, Nl, Fl)
    lig_mask: jnp.ndarray  # (B, Nl) bool
    # keypoints (populated by a receptor encoder)
    kp_x: jnp.ndarray  # (B, K, 3)
    kp_h: jnp.ndarray  # (B, K, Dk)
    kp_mask: jnp.ndarray  # (B, K) bool
    kp_v: Optional[jnp.ndarray] = None  # (B, K, V, 3) for GVP variants
    # interface points (training only; reference pdbbind_processing.py:295-325)
    ip_x: Optional[jnp.ndarray] = None  # (B, P, 3)
    ip_mask: Optional[jnp.ndarray] = None  # (B, P) bool

    @property
    def batch_size(self) -> int:
        return self.lig_x.shape[0]

    @property
    def n_lig(self) -> int:
        return self.lig_x.shape[1]

    @property
    def n_kp(self) -> int:
        return self.kp_x.shape[1]

    @property
    def n_rec(self) -> int:
        return self.rec_x.shape[1]


def empty_keypoints(batch: int, n_kp: int, feat_dim: int, vec_dim: Optional[int] = None, dtype=jnp.float32):
    kp_x = jnp.zeros((batch, n_kp, 3), dtype)
    kp_h = jnp.zeros((batch, n_kp, feat_dim), dtype)
    kp_mask = jnp.zeros((batch, n_kp), bool)
    kp_v = None if vec_dim is None else jnp.zeros((batch, n_kp, vec_dim, 3), dtype)
    return kp_x, kp_h, kp_mask, kp_v


def make_complex(
    rec_x,
    rec_h,
    rec_mask,
    lig_x,
    lig_h,
    lig_mask,
    n_kp: int,
    kp_feat_dim: int,
    kp_vec_dim: Optional[int] = None,
    rec_res_idx=None,
    ip_x=None,
    ip_mask=None,
) -> PaddedComplex:
    b = rec_x.shape[0]
    if rec_res_idx is None:
        rec_res_idx = jnp.zeros(rec_x.shape[:2], jnp.int32)
    kp_x, kp_h, kp_mask, kp_v = empty_keypoints(b, n_kp, kp_feat_dim, kp_vec_dim)
    return PaddedComplex(
        rec_x=jnp.asarray(rec_x, jnp.float32),
        rec_h=jnp.asarray(rec_h, jnp.float32),
        rec_mask=jnp.asarray(rec_mask, bool),
        rec_res_idx=jnp.asarray(rec_res_idx, jnp.int32),
        lig_x=jnp.asarray(lig_x, jnp.float32),
        lig_h=jnp.asarray(lig_h, jnp.float32),
        lig_mask=jnp.asarray(lig_mask, bool),
        kp_x=kp_x,
        kp_h=kp_h,
        kp_mask=kp_mask,
        kp_v=kp_v,
        ip_x=None if ip_x is None else jnp.asarray(ip_x, jnp.float32),
        ip_mask=None if ip_mask is None else jnp.asarray(ip_mask, bool),
    )


# ---------------------------------------------------------------------------
# Synthetic complexes for tests / benchmarks (no local dataset is shipped with
# the reference mirror; see BASELINE.md). Geometry is physically plausible:
# a shell of pocket atoms around a compact ligand blob.
# ---------------------------------------------------------------------------

def synthetic_complex_np(
    rng: np.random.Generator,
    n_rec: int,
    n_lig: int,
    n_rec_pad: int,
    n_lig_pad: int,
    n_rec_feat: int = 10,
    n_lig_feat: int = 10,
    n_ip_pad: int = 0,
    min_sep: float = 0.0,
):
    """One synthetic pocket/ligand pair as padded numpy arrays.

    min_sep > 0 places pocket atoms on a jittered grid with that minimum
    spacing (realistic protein packing ~1.8 A exclusion volume, so radius-
    graph degrees match real pockets); default keeps the legacy Poisson
    shell (denser local neighborhoods than real proteins)."""
    lig_x = rng.normal(size=(n_lig, 3)) * 2.0
    if min_sep > 0:
        # jittered-grid shell: cells of size min_sep in a radius-5..10 band
        cell = float(min_sep)
        lo, hi = -10.0, 10.0
        axis = np.arange(lo, hi, cell)
        gx, gy, gz = np.meshgrid(axis, axis, axis, indexing="ij")
        centers = np.stack([gx, gy, gz], axis=-1).reshape(-1, 3)
        r = np.linalg.norm(centers, axis=1)
        centers = centers[(r > 5.0) & (r < 10.0)]
        take = rng.choice(len(centers), size=min(n_rec, len(centers)), replace=False)
        rec_x = (lig_x.mean(0, keepdims=True) + centers[take]
                 + rng.uniform(-0.3, 0.3, size=(len(take), 3)) * cell)
        n_rec = len(take)
    else:
        # pocket atoms on a shell of radius ~6-10 A around the ligand COM
        dirs = rng.normal(size=(n_rec, 3))
        dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
        rad = rng.uniform(5.0, 10.0, size=(n_rec, 1))
        rec_x = lig_x.mean(0, keepdims=True) + dirs * rad + rng.normal(size=(n_rec, 3)) * 0.5

    def onehot(n, f):
        idx = rng.integers(0, f, size=n)
        out = np.zeros((n, f), np.float32)
        out[np.arange(n), idx] = 1
        return out

    rec_xp = np.zeros((n_rec_pad, 3), np.float32)
    rec_xp[:n_rec] = rec_x
    rec_hp = np.zeros((n_rec_pad, n_rec_feat), np.float32)
    rec_hp[:n_rec] = onehot(n_rec, n_rec_feat)
    rec_mask = np.zeros(n_rec_pad, bool)
    rec_mask[:n_rec] = True
    res_idx = np.zeros(n_rec_pad, np.int32)
    res_idx[:n_rec] = np.sort(rng.integers(0, max(n_rec // 4, 1), size=n_rec))

    lig_xp = np.zeros((n_lig_pad, 3), np.float32)
    lig_xp[:n_lig] = lig_x
    lig_hp = np.zeros((n_lig_pad, n_lig_feat), np.float32)
    lig_hp[:n_lig] = onehot(n_lig, n_lig_feat)
    lig_mask = np.zeros(n_lig_pad, bool)
    lig_mask[:n_lig] = True

    out = dict(
        rec_x=rec_xp, rec_h=rec_hp, rec_mask=rec_mask, rec_res_idx=res_idx,
        lig_x=lig_xp, lig_h=lig_hp, lig_mask=lig_mask,
    )
    if n_ip_pad:
        n_ip = min(max(n_lig // 2, 2), n_ip_pad)
        ip = np.zeros((n_ip_pad, 3), np.float32)
        # midpoints between random lig atoms and their nearest rec atoms
        li = rng.integers(0, n_lig, size=n_ip)
        d = np.linalg.norm(rec_x[None] - lig_x[li][:, None], axis=-1)
        ri = d.argmin(1)
        ip[:n_ip] = (lig_x[li] + rec_x[ri]) / 2
        ipm = np.zeros(n_ip_pad, bool)
        ipm[:n_ip] = True
        out.update(ip_x=ip, ip_mask=ipm)
    return out


def synthetic_batch(
    seed: int,
    batch: int,
    n_rec_pad: int = 96,
    n_lig_pad: int = 24,
    n_rec_feat: int = 10,
    n_lig_feat: int = 10,
    n_kp: int = 8,
    kp_feat_dim: int = 32,
    kp_vec_dim: Optional[int] = None,
    n_ip_pad: int = 16,
    min_rec: int = 24,
    min_lig: int = 8,
    min_sep: float = 0.0,
) -> PaddedComplex:
    rng = np.random.default_rng(seed)
    min_rec = min(min_rec, n_rec_pad)
    min_lig = min(min_lig, n_lig_pad)
    items = []
    for _ in range(batch):
        n_rec = int(rng.integers(min_rec, n_rec_pad + 1))
        n_lig = int(rng.integers(min_lig, n_lig_pad + 1))
        items.append(
            synthetic_complex_np(rng, n_rec, n_lig, n_rec_pad, n_lig_pad, n_rec_feat, n_lig_feat, n_ip_pad,
                                 min_sep=min_sep)
        )
    stacked = {k: np.stack([it[k] for it in items]) for k in items[0]}
    return make_complex(
        stacked["rec_x"], stacked["rec_h"], stacked["rec_mask"],
        stacked["lig_x"], stacked["lig_h"], stacked["lig_mask"],
        n_kp=n_kp, kp_feat_dim=kp_feat_dim, kp_vec_dim=kp_vec_dim,
        rec_res_idx=stacked["rec_res_idx"],
        ip_x=stacked.get("ip_x"), ip_mask=stacked.get("ip_mask"),
    )
