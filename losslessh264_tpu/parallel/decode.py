"""GOP-parallel pixel decode.

The reference decoder is strictly single-threaded (README.md:33 "Single
thread for all slices"). GOPs, however, share no pixel state — an IDR
resets the DPB — so decode-to-YUV parallelizes embarrassingly at GOP
granularity: each worker decodes `sps_pps_context + gop_bytes` as a
self-contained stream and the per-GOP frame runs concatenate in display
order. This is the host-level face of the same sharding the mesh program
uses for the device axis (`__graft_entry__.dryrun_multichip`).
"""
from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor

from .. import native


def decode_yuv_gop_parallel(data: bytes, max_workers: int = 8,
                            use_jax: bool = False):
    """Decode an Annex-B .264 to a list of (Y, U, V) numpy frames,
    GOP-parallel. Output frames (and crop) match the sequential decoder
    exactly. Returns (frames, crop_px)."""
    import numpy as np

    plan = native.shard_plan(data, max_workers)

    def one(seg):
        start, end, ctx = seg
        blob = ctx + data[start:end]
        if use_jax:
            from .. import decoder_jax
            dec = decoder_jax.JaxDecoder(blob)
        else:
            from .. import decoder_np
            dec = decoder_np.NpDecoder(blob)
        frames = [tuple(np.asarray(p) for p in f) for f in dec.frames()]
        return frames, dec.crop_px

    if len(plan) == 1:
        frames, crop = one(plan[0])
        return frames, crop
    with ThreadPoolExecutor(max_workers=min(max_workers, len(plan))) as ex:
        results = list(ex.map(one, plan))
    frames = [f for fr, _ in results for f in fr]
    return frames, results[0][1]
