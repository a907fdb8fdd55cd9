"""Wavefront scheduling helpers shared by the intra/deblock pipelines.

The slope-2 MB wavefront (2*row + col = const) guarantees that the local
windows of the MBs on one diagonal never overlap: MB strides are 16 px
and consecutive diagonal members are 2 MBs apart horizontally, so even
the deblock 24x24 windows (8 px left/top margin) stay disjoint. That
makes the per-diagonal writeback expressible as ONE XLA scatter instead
of a serial fori_loop of dynamic_update_slice — the reference's serial
per-MB loops (decode_slice.cpp:3064, deblocking.cpp:872) become one
vector op per diagonal.
"""
from __future__ import annotations

import jax.numpy as jnp


def scatter_tiles(plane, tiles, y0s, x0s, valid):
    """Write K non-overlapping [T,T] tiles into plane at (y0s[k], x0s[k]).

    Lanes with valid[k] == False are dropped (their rows are pushed out
    of bounds and the scatter uses mode="drop"). Tiles must not overlap
    — guaranteed on a slope-2 diagonal.
    """
    T = tiles.shape[1]
    r = jnp.arange(T)
    rows = jnp.where(valid, y0s, plane.shape[0])[:, None] + r[None, :]
    cols = x0s[:, None] + r[None, :]
    return plane.at[rows[:, :, None], cols[:, None, :]].set(
        tiles, mode="drop")
