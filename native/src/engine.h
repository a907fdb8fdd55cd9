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

// Per-feature billing tags, shared by BOTH ledgers (reference:
// billing.h:6-55 tag list + the dual bill[]/pip_decisions[] ledgers —
// dec_golomb.h:71-82 BILL_BITS original-side, compression_stream.cpp
// 211-234 recompressed-side). Invariants (tested): the bench ledger sums
// to exactly 8x the input .264 size; the ours ledger sums to exactly 8x
// the output .pip size (the reference asserts the same in BillTally,
// macroblock_model.cpp:124-154).
enum BillTag {
  BILL_MB_TYPE = 0,
  BILL_SKIP,          // mb_skip_run / mb_skip_flag
  BILL_END,           // slice-end bits (stop decision / end_of_slice_flag)
  BILL_CBP,           // CAVLC combined coded_block_pattern ue (bench side)
  BILL_CBP_LUMA,      // per-bit luma CBP (ours; CABAC bench)
  BILL_CBP_CHROMA,    // chroma CBP (ours; CABAC bench)
  BILL_QP,            // mb_qp_delta
  BILL_I4_MODE,       // intra 4x4 pred modes
  BILL_I8_MODE,       // intra 8x8 pred modes
  BILL_I16_MODE,      // I16x16 mode (ours; folded into mb_type in CAVLC)
  BILL_CHROMA_MODE,   // intra chroma pred mode
  BILL_SUB_MB,        // P8x8 sub_mb_type
  BILL_REF,           // ref_idx_l0
  BILL_MVD_X,
  BILL_MVD_Y,
  BILL_T8X8,          // transform_size_8x8_flag
  BILL_LUMA_DC,       // I16 luma DC block
  BILL_CHROMA_DC,
  BILL_LUMA_NZ,       // positions: coeff_token / cbf+sig+last maps
  BILL_LUMA_AC,       // level values (and signs)
  BILL_LUMA_RUN,      // CAVLC total_zeros + run_before (bench only)
  BILL_CHROMA_NZ,
  BILL_CHROMA_AC,
  BILL_CHROMA_RUN,
  BILL_PCM,           // PCM alignment + raw samples
  BILL_STARTCODE,     // Annex-B start codes + leading zeros
  BILL_NAL_HDR,       // NAL header byte
  BILL_PARAM_SET,     // SPS/PPS passthrough
  BILL_SLICE_HDR,     // slice header bits
  BILL_TRAILING,      // rbsp trailing/stop/alignment bits, escapes, cabac
                      // codeword warmup, trailing zero bytes
  BILL_RAW_FALLBACK,  // unmodeled VCL NALs passed through verbatim
  BILL_CONTAINER,     // .pip framing overhead (ours only)
  BILL_OTHER,         // SEI + everything unclassified
  // sub-tag resolution where the money is (reference billTo(label,int)
  // granularity, billing.h): the luma AC ledger split into its three
  // decision kinds. BILL_LUMA_AC keeps the zero/EOB structure bits.
  BILL_LUMA_AC_SIGN,  // AC sign bits
  BILL_LUMA_AC_MAG,   // AC magnitude (unary + exp-golomb tail) bits
  // CABAC bench-side sub-tags (luma non-DC blocks): the original
  // stream's position bits resolved into their three decision kinds
  // plus the bypass sign — the reference bills these separately via
  // billTo sub-labels (billing.h:6-55); needed to locate which CABAC
  // decision class leaks vs our recompressed columns.
  BILL_CABAC_CBF,     // coded_block_flag bits
  BILL_CABAC_SIG,     // significant_coeff_flag bits
  BILL_CABAC_LAST,    // last_significant_coeff_flag bits
  BILL_CABAC_SIGN,    // bypass-coded level sign bits
  // MVD bench resolution by partition class (16x16 vs smaller): where
  // motion cost concentrates decides which MVD contexts to deepen
  BILL_MVD_SUB_X,     // MVDs of sub-16x16 partitions
  BILL_MVD_SUB_Y,
  BILL_CHROMA_AC_SIGN,  // chroma AC sign bits (ours)
  BILL_CHROMA_AC_MAG,   // chroma AC magnitude bits (ours)
  BILL_NUM,
};

struct EngineStats {
  u64 in_bytes = 0;
  u64 out_bytes = 0;
  u64 n_nals = 0;
  u64 n_slices = 0;
  u64 n_fallback_slices = 0;  // passed through unmodeled
  u64 n_frames = 0;
  u64 n_mbs = 0;
  // ours ledger: compressed output bits per feature (sums to out size)
  double bill_bits[BILL_NUM] = {};
  // bench ledger: bits the ORIGINAL H.264 stream spent per feature,
  // accumulated during parse (sums to input size)
  double bench_bits[BILL_NUM] = {};
  // prior-hit stats (reference PRIOR_STATS, compression_stream.h:358-361):
  // per-tag adaptive decisions and how many matched the predicted symbol
  double prior_total[BILL_NUM] = {};
  double prior_hits[BILL_NUM] = {};
};

const char* bill_tag_name(int tag);

// Container format / model revision byte written into every .pip
// header (PIPT/PIPS). Python-side assemblers (checkpoint, multihost
// shard assembly) must write the same byte — they read it via the
// pip_version_c C export instead of hardcoding it.
u8 pip_container_version();

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
