// Top-level compress / decompress engine and the single-file .pip
// container.
//
// Reference parity: the h264dec driver loop (h264dec.cpp:123-374),
// WelsDecodeBs NAL walking + default-stream passthrough
// (decoder.cpp:656-845), WelsDecodeSliceForNonRecoding /
// WelsDecodeSliceForRecoding (decode_slice.cpp). Clean-room redesign:
// single-file container, explicit shared state transition, compress-time
// slice verification (the reference's ROUNDTRIP_TEST made always-cheap).
#pragma once

#include "common.h"

#include <map>
#include <string>

namespace h264pip {

struct EngineStats {
  u64 in_bytes = 0;
  u64 out_bytes = 0;
  u64 n_nals = 0;
  u64 n_slices = 0;
  u64 n_fallback_slices = 0;  // passed through unmodeled
  u64 n_frames = 0;
  u64 n_mbs = 0;
  // billing: arithmetic-stream bits per feature (indexes: see BillTag)
  double bill_bits[32] = {};
  // prior-hit stats (reference PRIOR_STATS, compression_stream.h:358-361):
  // per-tag adaptive decisions and how many matched the predicted symbol
  double prior_total[32] = {};
  double prior_hits[32] = {};
};

enum BillTag {
  BILL_MB_TYPE = 0,
  BILL_SKIP = 1,
  BILL_END = 2,
  BILL_CBP = 3,
  BILL_QP = 4,
  BILL_PRED_MODE = 5,
  BILL_INTRA_MODE = 6,
  BILL_SUB_MB = 7,
  BILL_REF = 8,
  BILL_MVD = 9,
  BILL_LUMA_DC = 10,
  BILL_CHROMA_DC = 11,
  BILL_LUMA_AC = 12,
  BILL_CHROMA_AC = 13,
  BILL_PCM = 14,
  BILL_OTHER = 15,
  BILL_NUM = 16,
};

// Compress an Annex-B .264 stream into the .pip container.
// Throws PipError on malformed input. `verify` re-synthesizes every slice
// during compression and asserts bit-equality with the original.
// `context`/`context_size`: optional NAL stream (SPS/PPS) parsed for
// parameter-set state but not emitted — used by GOP sharding.
std::vector<u8> pip_compress(const u8* data, size_t size, bool verify,
                             EngineStats* stats,
                             const u8* context = nullptr,
                             size_t context_size = 0);

// Byte offsets of GOP (IDR access-unit) segment starts, offset 0 first —
// the cut points used by sharded compression; each segment compressed
// with the SPS/PPS context accumulated before it yields a self-contained
// .pip (the basis of checkpoint/resume).
std::vector<size_t> pip_gop_starts(const u8* data, size_t size);

// GOP-sharded compression: splits at IDR access-unit boundaries into up
// to `n_shards` independent segments, compressed in parallel threads,
// each with its own model + arithmetic stream (the multi-host DCN
// sharding unit — shards share no state; SURVEY.md §5.8). Falls back to
// the plain container when no cut points exist.
std::vector<u8> pip_compress_sharded(const u8* data, size_t size,
                                     int n_shards, bool verify,
                                     EngineStats* stats);

// The exact shard decomposition pip_compress_sharded uses: byte ranges
// [start,end) of whole-GOP groups byte-balanced into <= n_shards
// shards, plus the SPS/PPS context bytes each shard's compressor must
// absorb. Exposed so a multi-host driver can compress a disjoint shard
// subset per host and assemble a container byte-identical to the
// single-host one (losslessh264_tpu/parallel).
struct ShardPlan {
  std::vector<std::pair<size_t, size_t>> ranges;
  std::vector<std::vector<u8>> contexts;
};
ShardPlan pip_shard_plan(const u8* data, size_t size, int n_shards);

// Reconstruct the original .264 byte stream from a .pip container
// (plain "PIPT" or sharded "PIPS"; sharded segments decode in parallel).
std::vector<u8> pip_decompress(const u8* data, size_t size,
                               EngineStats* stats);

}  // namespace h264pip
