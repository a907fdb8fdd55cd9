"""Deblock implementation parity: the vectorized scan wavefront must be
element-exact vs the legacy serial-diagonal path, including under an
8-device shard_map (the multi-chip dryrun configuration that broke in
round 1 — scan-vma carry rule).

Reference behavior: the serial per-MB loop WelsDeblockingFilterSlice /
WelsDeblockingMb (decoder/core/src/deblocking.cpp:815-872).
"""
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from losslessh264_tpu.ops import deblock as jdb

pytestmark = pytest.mark.slow  # compile-heavy: excluded from `make check-fast`


def _random_frame(mb_w, mb_h, seed=0):
    rng = np.random.RandomState(seed)
    n = mb_w * mb_h
    H, W = mb_h * 16, mb_w * 16
    P = jdb.WPAD
    Yw = rng.randint(0, 256, (H + 2 * P, W + 2 * P)).astype(np.int32)
    Uw = rng.randint(0, 256, (H // 2 + 2 * P, W // 2 + 2 * P)).astype(np.int32)
    Vw = rng.randint(0, 256, (H // 2 + 2 * P, W // 2 + 2 * P)).astype(np.int32)
    args = dict(
        cls=rng.randint(0, 9, (n,)).astype(np.int32),
        qp=rng.randint(10, 52, (n,)).astype(np.int32),
        nnz=rng.randint(0, 3, (n, 16)).astype(np.int32),
        mv=rng.randint(-16, 17, (n, 16, 2)).astype(np.int32),
        ref_idx=rng.randint(0, 2, (n, 16)).astype(np.int32),
        slice_id=(np.arange(n) // (mb_w * 2)).astype(np.int32),
        deblock_idc=np.zeros((n,), np.int32),
        alpha_off=np.zeros((n,), np.int32),
        beta_off=np.zeros((n,), np.int32),
        transform8=rng.randint(0, 2, (n,)).astype(np.int32),
    )
    return Yw, Uw, Vw, args


def _run(impl, mb_w, mb_h, Yw, Uw, Vw, args):
    prev = os.environ.get("PIP_DEBLOCK")
    os.environ["PIP_DEBLOCK"] = impl
    try:
        out = jdb.deblock_frame(
            mb_w, mb_h, jnp.asarray(Yw), jnp.asarray(Uw), jnp.asarray(Vw),
            jnp.asarray(args["cls"]), jnp.asarray(args["qp"]),
            jnp.asarray(args["nnz"]), jnp.asarray(args["mv"]),
            jnp.asarray(args["ref_idx"]), jnp.asarray(args["slice_id"]),
            jnp.asarray(args["deblock_idc"]), jnp.asarray(args["alpha_off"]),
            jnp.asarray(args["beta_off"]), jnp.asarray(args["transform8"]),
            0)
        return [np.asarray(a) for a in out]
    finally:
        if prev is None:
            os.environ.pop("PIP_DEBLOCK", None)
        else:
            os.environ["PIP_DEBLOCK"] = prev


@pytest.mark.parametrize("mb_w,mb_h,seed", [(4, 3, 0), (1, 4, 2),
                                            (2, 3, 9)])
def test_scan_matches_legacy(mb_w, mb_h, seed):
    Yw, Uw, Vw, args = _random_frame(mb_w, mb_h, seed)
    a = _run("legacy", mb_w, mb_h, Yw, Uw, Vw, args)
    b = _run("scan", mb_w, mb_h, Yw, Uw, Vw, args)
    for x, y, name in zip(a, b, "YUV"):
        np.testing.assert_array_equal(x, y, err_msg=f"plane {name}")


def test_scan_mb_corner_strong_filter():
    """Regression for the round-2 corner-staleness bug: the output
    ownership map assigns the 3x3 pixels above-left of each MB to that
    MB's window, whose serial-order last writer is the LEFT neighbor's
    top-edge horizontal filter — the scan's left-halo refresh must copy
    those rows (5:8 luma / 7:8 chroma) or the corners go stale. All-intra
    MBs (bS 4 at MB edges) + smooth gradient content + high QP make the
    strong filter fire at every corner, so any staleness shows."""
    mb_w, mb_h = 3, 3
    n = mb_w * mb_h
    H, W = mb_h * 16, mb_w * 16
    P = jdb.WPAD
    yy, xx = np.mgrid[:H + 2 * P, :W + 2 * P]
    Yw = ((yy * 5 + xx * 3) // 4 % 180 + 30).astype(np.int32)
    cyy, cxx = np.mgrid[:H // 2 + 2 * P, :W // 2 + 2 * P]
    Uw = ((cyy * 7 + cxx * 2) // 3 % 150 + 40).astype(np.int32)
    Vw = ((cyy * 3 + cxx * 5) // 3 % 150 + 50).astype(np.int32)
    rng = np.random.RandomState(0)
    args = dict(
        cls=np.zeros((n,), np.int32),                  # all intra: bS 4
        qp=rng.randint(38, 52, (n,)).astype(np.int32),  # wide alpha/beta
        nnz=np.ones((n, 16), np.int32),
        mv=np.zeros((n, 16, 2), np.int32),
        ref_idx=np.zeros((n, 16), np.int32),
        slice_id=np.zeros((n,), np.int32),
        deblock_idc=np.zeros((n,), np.int32),
        alpha_off=np.zeros((n,), np.int32),
        beta_off=np.zeros((n,), np.int32),
        transform8=np.zeros((n,), np.int32),
    )
    a = _run("legacy", mb_w, mb_h, Yw, Uw, Vw, args)
    b = _run("scan", mb_w, mb_h, Yw, Uw, Vw, args)
    for x, y, name in zip(a, b, "YUV"):
        np.testing.assert_array_equal(x, y, err_msg=f"plane {name}")


def test_scan_under_shard_map():
    """The scan path must trace and run inside shard_map (batched frames
    sharded over the mesh) — guards the round-1 scan-vma regression."""
    try:
        from jax import shard_map
    except ImportError:
        from jax.experimental.shard_map import shard_map
    from jax.sharding import Mesh, PartitionSpec as P

    devs = jax.devices("cpu")
    if len(devs) < 4:
        pytest.skip("needs >=4 virtual devices")
    mesh = Mesh(np.array(devs[:4]), axis_names=("gop",))

    mb_w, mb_h = 3, 2
    frames = [_random_frame(mb_w, mb_h, seed=s) for s in range(4)]
    Yb = jnp.stack([jnp.asarray(f[0]) for f in frames])
    Ub = jnp.stack([jnp.asarray(f[1]) for f in frames])
    Vb = jnp.stack([jnp.asarray(f[2]) for f in frames])
    keys = list(frames[0][3].keys())
    ab = {k: jnp.stack([jnp.asarray(f[3][k]) for f in frames])
          for k in keys}

    def per_frame(Y, U, V, a):
        return jdb.deblock_frame(
            mb_w, mb_h, Y, U, V, a["cls"], a["qp"], a["nnz"], a["mv"],
            a["ref_idx"], a["slice_id"], a["deblock_idc"], a["alpha_off"],
            a["beta_off"], a["transform8"], 0)

    prev = os.environ.get("PIP_DEBLOCK")
    os.environ["PIP_DEBLOCK"] = "scan"
    try:
        fn = shard_map(
            lambda Y, U, V, a: jax.vmap(per_frame)(Y, U, V, a),
            mesh=mesh, in_specs=(P("gop"),) * 4,
            out_specs=(P("gop"),) * 3)
        outY, outU, outV = jax.jit(fn)(Yb, Ub, Vb, ab)
        ref = [_run("legacy", mb_w, mb_h, *frames[i][:3], frames[i][3])
               for i in range(4)]
    finally:
        if prev is None:
            os.environ.pop("PIP_DEBLOCK", None)
        else:
            os.environ["PIP_DEBLOCK"] = prev
    for i in range(4):
        np.testing.assert_array_equal(np.asarray(outY[i]), ref[i][0])
        np.testing.assert_array_equal(np.asarray(outU[i]), ref[i][1])
        np.testing.assert_array_equal(np.asarray(outV[i]), ref[i][2])
