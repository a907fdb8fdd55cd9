"""Evidence artifact: sharded/multihost compression equality.

Writes evidence/SHARDS.json recording that
  (a) `native.compress_sharded(data, 8)` decompresses byte-exactly,
  (b) the multihost path (every process count 1/2/4/8 compressing its
      strided shard subset, then assembly) produces BYTE-IDENTICAL
      output to the single-host sharded container, and
  (c) the 8-device virtual CPU mesh dryrun of the multi-chip pipeline
      compiles and runs (__graft_entry__.dryrun_multichip).

Run under the virtual mesh: the `make evidence` target sets
JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8.
"""
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from losslessh264_tpu import native              # noqa: E402
from losslessh264_tpu.parallel import gop        # noqa: E402

STREAM = "/root/reference/roundtriptest/tibby.264"


def main():
    data = open(STREAM, "rb").read()
    out = {"stream": os.path.basename(STREAM), "bytes_in": len(data)}

    ref_pip, _ = native.compress_sharded(data, 8)
    rt, _ = native.decompress(ref_pip)
    out["sharded8_bitexact"] = rt == data
    out["sharded8_bytes"] = len(ref_pip)

    equal = {}
    for pc in (1, 2, 4, 8):
        payloads = {}
        for pi in range(pc):
            payloads.update(gop.compress_multihost(data, 8, pi, pc))
        assembled = gop.assemble(data, payloads, 8)
        equal[str(pc)] = assembled == ref_pip
    out["multihost_equal_to_singlehost"] = equal

    import jax
    # the axon TPU plugin keeps the default backend at 1 device; the
    # virtual 8-device mesh lives on the CPU backend (XLA_FLAGS), which
    # dryrun_multichip falls back to explicitly
    try:
        n_cpu = len(jax.devices("cpu"))
    except Exception:
        n_cpu = 1
    out["mesh_devices"] = n_cpu
    import __graft_entry__ as g
    g.dryrun_multichip(min(8, n_cpu))
    out["dryrun_multichip_ok"] = True

    art = os.path.join(os.path.dirname(__file__), "..", "evidence")
    os.makedirs(art, exist_ok=True)
    with open(os.path.join(art, "SHARDS.json"), "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out, indent=1))
    ok = (out["sharded8_bitexact"] and all(equal.values())
          and out["dryrun_multichip_ok"])
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
