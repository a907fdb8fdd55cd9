// Common types and utilities for the h264pip native core.
//
// This library is the host-side entropy spine of the TPU-native
// losslessh264 rebuild: everything bit-serial (bitstream parse/write,
// arithmetic coding, context modeling) lives here; pixel-domain compute
// lives in JAX/Pallas (losslessh264_tpu/ops).
//
// Reference capability parity: codec/decoder/core + the Pied-Piper layer
// (compression_stream.{h,cpp}, macroblock_model.{h,cpp}, decode_slice.cpp)
// of gitter-badger/losslessh264 — clean-room redesign, not a translation.
#pragma once

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>
#include <stdexcept>

namespace h264pip {

using u8 = uint8_t;
using u16 = uint16_t;
using u32 = uint32_t;
using u64 = uint64_t;
using i8 = int8_t;
using i16 = int16_t;
using i32 = int32_t;
using i64 = int64_t;

// Parse/roundtrip failures throw; the C API boundary converts to error codes.
struct PipError : std::runtime_error {
  explicit PipError(const std::string& what) : std::runtime_error(what) {}
};

#define PIP_CHECK(cond, msg)                                              \
  do {                                                                    \
    if (!(cond)) {                                                        \
      throw ::h264pip::PipError(std::string("check failed: ") + (msg) +   \
                                " at " + __FILE__ + ":" +                 \
                                std::to_string(__LINE__));                \
    }                                                                     \
  } while (0)

inline int ilog2_floor(u32 v) {  // floor(log2(v)), v >= 1
  return 31 - __builtin_clz(v);
}
inline int bit_length(u32 v) { return v == 0 ? 0 : ilog2_floor(v) + 1; }

// Map signed to unsigned interleaving 0,-1,1,-2,2... (value order used by
// the QP-delta swizzle; reference: macroblock_model.cpp swizzle_sign).
inline u16 swizzle_sign(i16 v) {
  return v >= 0 ? (u16(v) << 1) : ((u16(-v - 1) << 1) | 1);
}
inline i16 unswizzle_sign(u16 v) {
  return (v & 1) ? i16(-(i32(v >> 1)) - 1) : i16(v >> 1);
}

}  // namespace h264pip
