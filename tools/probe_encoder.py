"""Per-stage device-compute breakdown of the P-frame encoder path at
720p (VERDICT r4 #2: the sentinel split proved compute_wait is the
720p-encode bound; this names the stage). Each stage is jitted and
timed standalone with a 4-byte sync, so numbers include one ~dispatch
overhead each — read them as relative shares. Writes
evidence/ENCPROBE.json.

Usage: python tools/probe_encoder.py [--radius N]
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np          # noqa: E402
import jax                  # noqa: E402
import jax.numpy as jnp     # noqa: E402


def sync1(x):
    leaf = jax.tree_util.tree_leaves(x)[0]
    np.asarray(leaf.ravel()[0:1])


def timeit(fn, reps=5):
    r = fn()
    sync1(r)
    t0 = time.perf_counter()
    for _ in range(reps):
        r = fn()
    sync1(r)
    return (time.perf_counter() - t0) / reps * 1e3


def main():
    from losslessh264_tpu import encoder_jax as E
    from losslessh264_tpu.ops import mc as jmc
    from losslessh264_tpu.ops import me as jme
    from losslessh264_tpu.ops import transform as jt
    import bench

    radius = 16
    if "--radius" in sys.argv:
        radius = int(sys.argv[sys.argv.index("--radius") + 1])
    W, H = 1280, 720
    mb_w, mb_h = W // 16, H // 16
    n = mb_w * mb_h
    rng = np.random.RandomState(0)
    Y = jnp.asarray(rng.randint(0, 255, (H, W), np.int32))
    refY = jnp.asarray(rng.randint(0, 255, (H + 2 * E.PAD, W + 2 * E.PAD),
                                   np.uint8)).astype(jnp.int32)[None]
    refU = jnp.asarray(rng.randint(0, 255, (H // 2 + E.PAD, W // 2 + E.PAD),
                                   np.uint8)).astype(jnp.int32)[None]
    qp = jnp.full((n,), 28, jnp.int32)

    rep = {"radius": radius, "probe_gbps": round(bench._probe_gbps(), 2)}

    @jax.jit
    def me_stage(Y, refY):
        refp = jax.lax.dynamic_slice(
            refY[0], (E.PAD - radius, E.PAD - radius),
            (H + 2 * radius, W + 2 * radius))
        return jme.dense_full_search(Y, refp, radius)

    rep["me_dense_ms"] = round(timeit(lambda: me_stage(Y, refY)), 1)

    hp = jax.jit(jmc.halfpel_planes_pallas)
    rep["halfpel_ms"] = round(timeit(lambda: hp(refY[0])), 1)
    planes = jax.jit(jmc.halfpel_planes)(refY[0])
    jax.block_until_ready(planes)

    mbi = np.arange(n)
    by8 = jnp.asarray(np.repeat((mbi // mb_w) * 16, 4)
                      + np.tile([0, 0, 8, 8], n))
    bx8 = jnp.asarray(np.repeat((mbi % mb_w) * 16, 4)
                      + np.tile([0, 8, 0, 8], n))
    ivx = jnp.asarray(rng.randint(-radius, radius, n * 4))
    ivy = jnp.asarray(rng.randint(-radius, radius, n * 4))
    src8 = jnp.asarray(rng.randint(0, 255, (n * 4, 8, 8), np.int32))
    part = jnp.zeros((n,), jnp.int32)

    sp = jax.jit(lambda p: jme.subpel_quad(p, E.PAD, by8, bx8,
                                           ivx * 4, ivy * 4, src8, part))
    rep["subpel_ms"] = round(timeit(lambda: sp(planes)), 1)

    mv = jnp.zeros((n * 4, 2), jnp.int32)
    cm = jax.jit(lambda r: jmc.mc_chroma_mbs(
        r, E.PAD // 2, by8 // 2, bx8 // 2, mv[:, 0], mv[:, 1], size=4))
    rep["chroma_mc_ms"] = round(timeit(lambda: cm(refU[0])), 1)

    resid = jnp.asarray(rng.randint(-64, 64, (n * 16, 16), np.int32)).T
    qp_b = jnp.repeat(qp, 16)

    @jax.jit
    def xq(resid):
        Wp = jt.fdct4x4_pm(resid)
        q = jt.quant4_pm(Wp, qp_b, False)
        d = jt.dequant4_pm(q, qp_b, jnp.int32(16))
        return jt.idct4x4_pm(d)

    rep["xform_quant_ms"] = round(timeit(lambda: xq(resid)), 1)

    recY = jnp.asarray(rng.randint(0, 255, (H, W), np.uint8))
    recU = jnp.asarray(rng.randint(0, 255, (H // 2, W // 2), np.uint8))
    cls = jnp.full((n,), 3, jnp.int32)
    nnz = jnp.ones((n, 16), jnp.int32)
    mvc = jnp.zeros((n, 16, 2), jnp.int32)
    sid = jnp.zeros((n,), jnp.int32)
    db = jax.jit(lambda a, b, c: E._deblock_recon(
        mb_w, mb_h, a, b, c, cls, qp, nnz, mvc, sid, jnp.int32(0)))
    rep["deblock_ms"] = round(timeit(lambda: db(recY, recU, recU)), 1)

    out = os.path.join(os.path.dirname(__file__), "..", "evidence",
                       "ENCPROBE.json")
    with open(out, "w") as fh:
        json.dump(rep, fh, indent=1)
    print(json.dumps(rep))


if __name__ == "__main__":
    main()
