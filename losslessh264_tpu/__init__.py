"""losslessh264_tpu — TPU-native H.264 decode + lossless recompression engine.

A from-scratch rebuild of the capabilities of Dropbox's `losslessh264`
("Pied Piper" recompression on OpenH264; reference layout documented in
SURVEY.md): Constrained-Baseline/Main/High H.264 decoding (CAVLC + CABAC
entropy decode, 4x4/8x8 integer transform, intra + inter prediction,
in-loop deblocking, multi-reference DPB) plus a lossless recompression
layer that re-entropy-codes every macroblock symbol with a context-modeled
adaptive binary arithmetic coder and reconstructs the original `.264`
byte-for-byte.

Architecture (TPU-first, not a port):
  * `native/` (C++, loaded via ctypes): the bit-serial entropy spine —
    bitstream parse/write, bool arithmetic coder, context model, `.pip`
    container. Mirrors the reference's native C++ core
    (reference: codec/decoder/core, codec/common) but with a clean-room,
    shared state-transition design.
  * `losslessh264_tpu.ops`: JAX/Pallas pixel-domain kernels — dequant +
    IDCT, intra prediction wavefront, quarter-pel MC, deblocking
    (reference: codec/common SIMD + codec/decoder/core recon,
    e.g. decode_mb_aux.cpp, get_intra_predictor.cpp, mc.cpp).
  * `losslessh264_tpu.parallel`: GOP/slice sharding over jax.sharding.Mesh.
"""

__version__ = "0.1.0"
