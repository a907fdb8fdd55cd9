"""Distributed execution layer (SURVEY.md §2.7 / §5.8).

The reference is single-node (its only concurrency is encoder slice
threads, slice_multi_threading.cpp:999). This package supplies the
multi-host design the rebuild adds: GOP shards are the DCN-independent
distribution unit (an IDR cut shares no decoder, model, or arithmetic
state with its neighbors — only SPS/PPS, which each shard's compressor
absorbs as context), so

- within one host, shards compress on parallel threads in the native
  engine (native/src/engine.cc pip_compress_sharded);
- across hosts, each process compresses a disjoint strided subset of the
  same shard plan and the payloads are exchanged host-side; assembly is
  byte-identical to the single-host container regardless of process
  count or scheduling (tests/test_parallel.py asserts this);
- within one chip/mesh, the pixel pipeline shards over the GOP/frame
  axis (`__graft_entry__.dryrun_multichip`'s Mesh program).
"""
from .gop import (assemble, compress_distributed, compress_multihost,
                  shard_assignment)
from .decode import decode_yuv_gop_parallel

__all__ = [
    "assemble",
    "compress_distributed",
    "compress_multihost",
    "shard_assignment",
    "decode_yuv_gop_parallel",
]
