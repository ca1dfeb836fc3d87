"""Spatial ordering for block-sparse edge layouts.

Sorting pocket atoms along a Morton (Z-order) curve makes radius-graph
neighbors concentrate near the diagonal in index space, so a banded
block-dense edge layout (dense T x 3T tiles, static slices, zero gathers)
covers most true edges. Used by the all-atom `kk_layout: block` path.
"""
from __future__ import annotations

import jax.numpy as jnp


def _spread_bits_10(v: jnp.ndarray) -> jnp.ndarray:
    """Insert two zero bits between each of the low 10 bits (Morton spreading)."""
    v = v & 0x3FF
    v = (v | (v << 16)) & 0x30000FF
    v = (v | (v << 8)) & 0x300F00F
    v = (v | (v << 4)) & 0x30C30C3
    v = (v | (v << 2)) & 0x9249249
    return v


def morton_code(x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """30-bit Morton codes for (B, N, 3) points; masked points sort last."""
    lo = jnp.min(jnp.where(mask[..., None], x, jnp.inf), axis=1, keepdims=True)
    hi = jnp.max(jnp.where(mask[..., None], x, -jnp.inf), axis=1, keepdims=True)
    span = jnp.maximum(hi - lo, 1e-6)
    q = jnp.clip(((x - lo) / span * 1023.0), 0, 1023).astype(jnp.int32)
    code = (
        _spread_bits_10(q[..., 0])
        | (_spread_bits_10(q[..., 1]) << 1)
        | (_spread_bits_10(q[..., 2]) << 2)
    )
    return jnp.where(mask, code, jnp.int32(2**30))  # padded entries last


def spatial_sort_permutation(x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """(B, N) permutation sorting points along the Morton curve."""
    return jnp.argsort(morton_code(x, mask), axis=1)


def choose_tile(n: int, tile: int) -> int:
    """Clamp the tile size to the node capacity; fall back to one tile
    (exact, window spans everything) when it does not divide."""
    tile = min(tile, n)
    return tile if n % tile == 0 else n


def block_windows(arr: jnp.ndarray, tile: int) -> jnp.ndarray:
    """(B, N, ...) -> (B, nt, 3*tile, ...): for each tile of `tile` rows,
    the rows of the previous, own, and next tiles (edge tiles zero-padded).
    Pure static slicing — no gathers."""
    b, n = arr.shape[:2]
    assert n % tile == 0, f"N={n} must be a multiple of tile={tile}"
    nt = n // tile
    tiles = arr.reshape(b, nt, tile, *arr.shape[2:])
    pad_spec = [(0, 0), (1, 1)] + [(0, 0)] * (tiles.ndim - 2)
    tp = jnp.pad(tiles, pad_spec)
    return jnp.concatenate([tp[:, :-2], tp[:, 1:-1], tp[:, 2:]], axis=2)
