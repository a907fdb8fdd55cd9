"""Stage-level validation of the JAX/TPU kernels against the numpy
reconstruction oracle (which is itself validated bit-exactly against the
reference decoder's YUV output)."""
import numpy as np
import pytest

from losslessh264_tpu import decoder_np as dn
from losslessh264_tpu.ops import mc as jmc
from losslessh264_tpu.ops import transform as jt

pytestmark = pytest.mark.slow  # compile-heavy: excluded from `make check-fast`

rng = np.random.default_rng(7)


def test_dequant4_idct4():
    coeff = rng.integers(-256, 256, (64, 4, 4)).astype(np.int16)
    qps = rng.integers(0, 52, (64,))
    w = np.full((4, 4), 16, np.int32)
    got = np.asarray(jt.idct4x4(jt.dequant4(coeff, qps, w)))
    for i in range(64):
        want = dn.idct4x4(dn.dequant4(coeff[i], int(qps[i]), w))
        np.testing.assert_array_equal(got[i], want)


def test_dequant4_scaling_list():
    coeff = rng.integers(-64, 64, (16, 4, 4)).astype(np.int16)
    qps = rng.integers(0, 52, (16,))
    wz = rng.integers(4, 60, (16,)).astype(np.int32)
    w = dn._weights4(wz)
    got = np.asarray(jt.dequant4(coeff, qps, w))
    for i in range(16):
        np.testing.assert_array_equal(got[i], dn.dequant4(coeff[i], int(qps[i]), w))


def test_idct8x8():
    coeff = rng.integers(-256, 256, (32, 8, 8)).astype(np.int16)
    qps = rng.integers(0, 52, (32,))
    w = np.full((8, 8), 16, np.int32)
    got = np.asarray(jt.idct8x8(jt.dequant8(coeff, qps, w)))
    for i in range(32):
        want = dn.idct8x8(dn.dequant8(coeff[i], int(qps[i]), w))
        np.testing.assert_array_equal(got[i], want)


def test_luma_dc():
    dc = rng.integers(-256, 256, (32, 4, 4)).astype(np.int16)
    qps = rng.integers(0, 52, (32,))
    got = np.asarray(jt.luma_dc_dequant(jt.hadamard4x4(dc), qps,
                                        np.int32(16)))
    w = np.full((4, 4), 16, np.int32)
    for i in range(32):
        want = dn.luma_dc_dequant(dn.hadamard4x4(dc[i].astype(np.int64)),
                                  int(qps[i]), w)
        np.testing.assert_array_equal(got[i], want)


def test_chroma_dc():
    dc = rng.integers(-128, 128, (32, 2, 2)).astype(np.int16)
    qps = rng.integers(0, 40, (32,))
    got = np.asarray(jt.chroma_dc_transform_dequant(dc, qps, np.int32(16)))
    w = np.full((4, 4), 16, np.int32)
    for i in range(32):
        a, b_, c, d = (int(dc[i, 0, 0]), int(dc[i, 0, 1]), int(dc[i, 1, 0]),
                       int(dc[i, 1, 1]))
        ht = np.array([[a + b_ + c + d, a - b_ + c - d],
                       [a + b_ - c - d, a - b_ - c + d]], np.int64)
        want = dn.chroma_dc_dequant(ht, int(qps[i]), w)
        np.testing.assert_array_equal(got[i], want)


def test_mc_luma():
    H, W, PAD = 64, 64, 32
    ref = rng.integers(0, 256, (H, W)).astype(np.uint8)
    ref_pad = np.pad(ref, PAD, mode="edge")
    stack = ref_pad[None]
    B = 200
    ys = rng.integers(0, H - 4, B)
    xs = rng.integers(0, W - 4, B)
    mvx = rng.integers(-40, 40, B)
    mvy = rng.integers(-40, 40, B)
    got = np.asarray(jmc.mc_luma_cells(stack, PAD, np.zeros(B, np.int32),
                                       ys, xs, mvx, mvy))
    for i in range(B):
        want = dn.mc_luma_block(ref_pad, PAD, int(ys[i]), int(xs[i]),
                                int(mvx[i]), int(mvy[i]), 4, 4)
        np.testing.assert_array_equal(got[i], want, err_msg=f"cell {i} mv=({mvx[i]},{mvy[i]})")


def test_forward_dct_quant():
    from losslessh264_tpu import encoder as enc
    blocks = rng.integers(-255, 256, (96, 4, 4)).astype(np.int32)
    qps = rng.integers(0, 52, (96,))
    intra = rng.integers(0, 2, (96,)).astype(bool)
    W = np.asarray(jt.fdct4x4(blocks))
    Z = np.asarray(jt.quant4(W, qps, intra))
    Zs = np.asarray(jt.quant4(W, qps, intra, skip_dc=True))
    for i in range(96):
        w_want = enc.fdct4x4(blocks[i])
        np.testing.assert_array_equal(W[i], w_want)
        np.testing.assert_array_equal(
            Z[i], enc.quant4x4(w_want, int(qps[i]), intra=bool(intra[i])))
        np.testing.assert_array_equal(
            Zs[i], enc.quant4x4(w_want, int(qps[i]), intra=bool(intra[i]),
                                skip_dc=True))


def test_forward_hadamard_dc():
    from losslessh264_tpu import encoder as enc
    dc = rng.integers(-30000, 30000, (64, 4, 4)).astype(np.int64)
    qps = rng.integers(0, 52, (64,))
    Yd = np.asarray(jt.fhadamard4x4(dc))
    Q = np.asarray(jt.quant_dc4(jt.fhadamard4x4(dc), qps))
    dc2 = rng.integers(-30000, 30000, (64, 2, 2)).astype(np.int64)
    Yd2 = np.asarray(jt.fhadamard2x2(dc2))
    Q2 = np.asarray(jt.quant_dc2(jt.fhadamard2x2(dc2), qps))
    for i in range(64):
        want = enc.fhadamard4(dc[i])
        np.testing.assert_array_equal(Yd[i], want)
        np.testing.assert_array_equal(Q[i], enc.quant_dc4(want, int(qps[i])))
        a, b_, c, d_ = (int(dc2[i, 0, 0]), int(dc2[i, 0, 1]),
                        int(dc2[i, 1, 0]), int(dc2[i, 1, 1]))
        want2 = np.array([[a + b_ + c + d_, a - b_ + c - d_],
                          [a + b_ - c - d_, a - b_ - c + d_]], np.int64)
        np.testing.assert_array_equal(Yd2[i], want2)
        np.testing.assert_array_equal(Q2[i], enc.quant_dc2(want2, int(qps[i])))


def test_zigzag4():
    blocks = rng.integers(-99, 99, (8, 4, 4))
    got = np.asarray(jt.zigzag4(blocks))
    for i in range(8):
        np.testing.assert_array_equal(got[i], blocks[i].reshape(16)[dn._ZZ4])


def test_mc_chroma():
    H, W, PAD = 32, 32, 16
    ref = rng.integers(0, 256, (H, W)).astype(np.uint8)
    ref_pad = np.pad(ref, PAD, mode="edge")
    stack = ref_pad[None]
    B = 200
    ys = rng.integers(0, H - 2, B)
    xs = rng.integers(0, W - 2, B)
    mvx = rng.integers(-40, 40, B)
    mvy = rng.integers(-40, 40, B)
    got = np.asarray(jmc.mc_chroma_cells(stack, PAD, np.zeros(B, np.int32),
                                         ys, xs, mvx, mvy))
    for i in range(B):
        want = dn.mc_chroma_block(ref_pad, PAD, int(ys[i]), int(xs[i]),
                                  int(mvx[i]), int(mvy[i]), 2, 2)
        np.testing.assert_array_equal(got[i], want)


def test_mc_bucketed_parity():
    """Bucketed dense-shift MC (ops/mc.py mc_fast_plan/mc_bucketed) is
    element-exact vs the general per-cell gather path on every fast
    cell: small MV sets, spilled long tails (> MC_CAP uniques), clipped
    / out-of-range MVs (fix-up gather), and intra cells."""
    import jax
    import jax.numpy as jnp

    rng = np.random.RandomState(7)
    mb_w, mb_h, pad = 6, 5, 32
    n = mb_w * mb_h
    R = 4
    ref_y = jnp.asarray(rng.randint(0, 255,
                                    (R, mb_h * 16 + 2 * pad,
                                     mb_w * 16 + 2 * pad), np.uint8))
    ref_u = jnp.asarray(rng.randint(0, 255,
                                    (R, mb_h * 8 + pad, mb_w * 8 + pad),
                                    np.uint8))
    ref_v = jnp.asarray(rng.randint(0, 255, ref_u.shape, np.uint8))
    fn = jax.jit(jmc.mc_bucketed,
                 static_argnames=("pad", "mb_w", "mb_h"))

    mbi = np.arange(n)
    cell = np.arange(16)
    cy0 = ((mbi // mb_w)[:, None] * 16
           + (cell // 4)[None, :] * 4).reshape(-1)
    cx0 = ((mbi % mb_w)[:, None] * 16
           + (cell % 4)[None, :] * 4).reshape(-1)

    for trial, n_mvs in enumerate((5, 60)):
        mvset = rng.randint(-100, 100, (n_mvs, 2))
        mv = mvset[rng.randint(0, n_mvs, (n, 16))].astype(np.int16)
        ref_slot = rng.randint(0, 2, (n, 16)).astype(np.int8)
        wild = rng.rand(n, 16) < 0.02
        mv[wild] = rng.randint(-400, 400, (wild.sum(), 2))
        ref_slot[rng.rand(n, 16) < 0.05] = -1
        plan = jmc.mc_fast_plan(mb_w, mb_h, ref_slot,
                                mv.astype(np.int32), pad)
        assert plan["mc_fast"], f"plan rejected (trial {trial})"
        p = {k: jnp.asarray(v) for k, v in plan.items()}
        p["ref_slot"] = jnp.asarray(ref_slot)
        p["mv"] = jnp.asarray(mv)
        py, pu, pv = (np.asarray(a) for a in fn(
            ref_y, ref_u, ref_v, pad, p, mb_w=mb_w, mb_h=mb_h))

        rs = ref_slot.reshape(-1).astype(np.int32)
        vx = mv[:, :, 0].reshape(-1).astype(np.int32)
        vy = mv[:, :, 1].reshape(-1).astype(np.int32)
        rc = np.clip(rs, 0, R - 1)
        cells = np.asarray(jmc.mc_luma_cells(
            ref_y, pad, jnp.asarray(rc), jnp.asarray(cy0),
            jnp.asarray(cx0), jnp.asarray(vx), jnp.asarray(vy)))
        cu = np.asarray(jmc.mc_chroma_cells(
            ref_u, pad // 2, jnp.asarray(rc), jnp.asarray(cy0 // 2),
            jnp.asarray(cx0 // 2), jnp.asarray(vx), jnp.asarray(vy)))
        cv = np.asarray(jmc.mc_chroma_cells(
            ref_v, pad // 2, jnp.asarray(rc), jnp.asarray(cy0 // 2),
            jnp.asarray(cx0 // 2), jnp.asarray(vx), jnp.asarray(vy)))
        for i in range(n * 16):
            if rs[i] < 0:
                continue
            np.testing.assert_array_equal(
                py[cy0[i]:cy0[i] + 4, cx0[i]:cx0[i] + 4], cells[i],
                err_msg=f"luma cell {i} trial {trial}")
            np.testing.assert_array_equal(
                pu[cy0[i] // 2:cy0[i] // 2 + 2,
                   cx0[i] // 2:cx0[i] // 2 + 2], cu[i],
                err_msg=f"cb cell {i} trial {trial}")
            np.testing.assert_array_equal(
                pv[cy0[i] // 2:cy0[i] // 2 + 2,
                   cx0[i] // 2:cx0[i] // 2 + 2], cv[i],
                err_msg=f"cr cell {i} trial {trial}")
