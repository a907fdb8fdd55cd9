"""Multi-host GOP-sharded compression.

Every host computes the SAME shard plan from the input bytes (the native
engine's byte-balanced whole-GOP grouping, `native.shard_plan`), then
compresses only the shards assigned to its process index. Payloads are
exchanged with a host-side all-gather and every host assembles the same
sharded container — byte-identical to what a single host running
`native.compress_sharded` produces, because shard payloads depend only
on (shard bytes, SPS/PPS context), never on where or when they were
compressed (the determinism contract of SURVEY.md §5.8: per-shard model
+ arithmetic stream sets).
"""
from __future__ import annotations

import zlib
from concurrent.futures import ThreadPoolExecutor

from .. import native


def _varint(v: int) -> bytes:
    out = bytearray()
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def shard_assignment(n_shards: int, process_index: int,
                     process_count: int) -> list[int]:
    """Strided shard-index subset for one process. Strided (not blocked)
    so the byte-balanced plan stays balanced across hosts even when
    n_shards is not a multiple of process_count."""
    if not 0 <= process_index < process_count:
        raise ValueError("process_index out of range")
    return list(range(process_index, n_shards, process_count))


def compress_multihost(data: bytes, n_shards: int, process_index: int,
                       process_count: int, verify: bool = False,
                       max_workers: int | None = None) -> dict[int, bytes]:
    """Compress this process's strided subset of the shard plan.

    Returns {shard_index: payload} for the local shards only; payloads
    are self-contained .pip (PIPT) segments. Local shards run on a
    thread pool (the native engine releases the GIL)."""
    plan = native.shard_plan(data, n_shards)
    mine = shard_assignment(len(plan), process_index, process_count)

    def one(i: int) -> tuple[int, bytes]:
        start, end, ctx = plan[i]
        pip, _ = native.compress(data[start:end], verify=verify, context=ctx)
        return i, pip

    with ThreadPoolExecutor(max_workers=max_workers or len(mine) or 1) as ex:
        return dict(ex.map(one, mine))


def assemble(data: bytes, payloads: dict[int, bytes],
             n_shards: int) -> bytes:
    """Assemble the complete shard payload set into the standard sharded
    (PIPS) container — byte-identical to native.compress_sharded(data,
    n_shards). A single-shard plan assembles to the plain PIPT payload
    (also matching the native fallback)."""
    plan = native.shard_plan(data, n_shards)
    missing = [i for i in range(len(plan)) if i not in payloads]
    if missing:
        raise RuntimeError(f"missing shard payloads: {missing[:8]}")
    ordered = [payloads[i] for i in range(len(plan))]
    if len(ordered) == 1:
        return ordered[0]
    out = bytearray(b"PIPS") + bytes([native.container_version()])
    out += _varint(len(data))
    out += _varint(zlib.crc32(data) & 0xFFFFFFFF)
    out += _varint(len(ordered))
    for p in ordered:
        out += _varint(len(p))
    for p in ordered:
        out += p
    return bytes(out)


def _allgather_payloads(payloads: dict[int, bytes],
                        n_shards: int) -> dict[int, bytes]:
    """Exchange shard payloads across jax processes (DCN host transfer).

    Variable-length bytes ride a fixed-shape uint8 all-gather: each host
    contributes a [n_shards, 1 + max_len] plane (presence flag + padded
    payload) with per-shard lengths gathered first so the pad is the
    global max. Single-process runtimes return the input unchanged."""
    import jax
    if jax.process_count() == 1:
        return payloads
    import numpy as np
    from jax.experimental import multihost_utils

    lens = np.zeros((n_shards,), np.int64)
    for i, p in payloads.items():
        lens[i] = len(p)
    all_lens = multihost_utils.process_allgather(lens)  # [P, n_shards]
    max_len = int(all_lens.max())
    plane = np.zeros((n_shards, max_len + 1), np.uint8)
    for i, p in payloads.items():
        plane[i, 0] = 1
        plane[i, 1:1 + len(p)] = np.frombuffer(p, np.uint8)
    planes = multihost_utils.process_allgather(plane)   # [P, n_shards, L+1]
    out: dict[int, bytes] = {}
    for pi in range(planes.shape[0]):
        for i in range(n_shards):
            if planes[pi, i, 0]:
                n = int(all_lens[pi, i])
                out[i] = planes[pi, i, 1:1 + n].tobytes()
    return out


def compress_distributed(data: bytes, n_shards: int,
                         verify: bool = False) -> bytes:
    """One-call multi-host compression: shard plan -> local strided
    compress -> host all-gather -> identical container on every host.
    In a single-process runtime this equals native.compress_sharded."""
    import jax
    pi, pc = jax.process_index(), jax.process_count()
    local = compress_multihost(data, n_shards, pi, pc, verify=verify)
    plan_size = len(native.shard_plan(data, n_shards))
    full = _allgather_payloads(local, plan_size)
    return assemble(data, full, n_shards)
