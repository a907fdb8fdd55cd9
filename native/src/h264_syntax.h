// H.264 syntax structures: parameter sets, slice headers, macroblock
// records, and the shared per-picture parse state.
//
// Reference parity: codec/decoder/core/src/au_parser.cpp (SPS/PPS),
// decoder_core.cpp ParseSliceHeaderSyntaxs, decoded_macroblock.h
// (DecodedMacroblock / "rtd"). Clean-room from ISO 14496-10 §7.3.
#pragma once

#include "bitio.h"
#include "common.h"

#include <array>
#include <map>
#include <memory>

namespace h264pip {

// ---------------------------------------------------------------------------
// Parameter sets
// ---------------------------------------------------------------------------

struct Sps {
  int profile_idc = 0;
  u8 constraint_flags = 0;
  int level_idc = 0;
  int sps_id = 0;
  int chroma_format_idc = 1;  // 4:2:0 unless High profile says otherwise
  bool separate_colour_plane = false;
  int bit_depth_luma = 8, bit_depth_chroma = 8;
  bool qpprime_y_zero_transform_bypass = false;
  bool seq_scaling_matrix_present = false;
  bool scaling_list_present[12] = {};
  u8 scaling_4x4[6][16] = {};
  u8 scaling_8x8[6][64] = {};
  int log2_max_frame_num = 4;
  int pic_order_cnt_type = 0;
  int log2_max_poc_lsb = 4;
  bool delta_pic_order_always_zero = false;
  i32 offset_for_non_ref_pic = 0, offset_for_top_to_bottom = 0;
  std::vector<i32> offsets_for_ref_frame;
  int max_num_ref_frames = 1;
  bool gaps_in_frame_num_allowed = false;
  int pic_width_in_mbs = 0;
  int pic_height_in_map_units = 0;
  bool frame_mbs_only = true;
  bool mb_adaptive_frame_field = false;
  bool direct_8x8_inference = true;
  bool frame_cropping = false;
  int crop[4] = {};
  bool vui_present = false;

  int mb_width() const { return pic_width_in_mbs; }
  int mb_height() const { return pic_height_in_map_units * (frame_mbs_only ? 1 : 2); }
};

struct Pps {
  int pps_id = 0, sps_id = 0;
  bool entropy_coding_mode = false;  // false: CAVLC, true: CABAC
  bool bottom_field_pic_order_in_frame_present = false;
  int num_slice_groups = 1;
  int slice_group_map_type = 0;
  std::vector<u32> run_length;                  // map type 0
  std::vector<u32> top_left, bottom_right;      // map type 2
  bool slice_group_change_direction = false;    // map types 3..5
  int slice_group_change_rate = 1;
  std::vector<u32> slice_group_id;              // map type 6
  int num_ref_idx_l0_default = 1, num_ref_idx_l1_default = 1;
  bool weighted_pred = false;
  int weighted_bipred_idc = 0;
  int pic_init_qp = 26, pic_init_qs = 26;
  int chroma_qp_index_offset = 0;
  bool deblocking_filter_control_present = false;
  bool constrained_intra_pred = false;
  bool redundant_pic_cnt_present = false;
  // --- optional extension (High profile) ---
  bool has_ext = false;
  bool transform_8x8_mode = false;
  bool pic_scaling_matrix_present = false;
  bool scaling_list_present[12] = {};
  u8 scaling_4x4[6][16] = {};
  u8 scaling_8x8[6][64] = {};
  int second_chroma_qp_index_offset = 0;  // defaults to chroma_qp_index_offset
};

// Slice types (after %5)
enum SliceType { SLICE_P = 0, SLICE_B = 1, SLICE_I = 2, SLICE_SP = 3, SLICE_SI = 4 };

struct SliceHeader {
  int first_mb_in_slice = 0;
  int slice_type_raw = 0;
  int slice_type = SLICE_I;  // %5
  int pps_id = 0;
  int frame_num = 0;
  bool field_pic = false, bottom_field = false;
  int idr_pic_id = 0;
  int poc_lsb = 0;
  i32 delta_poc_bottom = 0;
  i32 delta_poc[2] = {0, 0};
  int redundant_pic_cnt = 0;
  bool direct_spatial_mv_pred = false;
  bool num_ref_idx_override = false;
  int num_ref_idx_l0_active = 1, num_ref_idx_l1_active = 1;
  bool ref_pic_list_mod_l0 = false;
  // ref_pic_list_modification ops for L0: pairs (idc, value)
  std::vector<std::pair<u32, u32>> rplr_l0;
  // dec_ref_pic_marking MMCO ops: (op, val1, val2)
  struct Mmco {
    u32 op, v1, v2;
  };
  std::vector<Mmco> mmco;
  bool adaptive_ref_pic_marking = false;
  bool no_output_of_prior_pics = false, long_term_reference_flag = false;
  // pred_weight_table (explicit weighted prediction, spec 7.3.3.2). Only
  // L0 is kept (no B slices in the supported profile set). Defaults when a
  // per-ref flag is absent: weight = 1<<denom, offset = 0.
  bool has_pred_weights = false;
  int luma_log2_weight_denom = 0, chroma_log2_weight_denom = 0;
  i16 luma_weight[32] = {}, luma_offset[32] = {};
  i16 chroma_weight[32][2] = {}, chroma_offset[32][2] = {};
  int cabac_init_idc = 0;
  int slice_qp = 26;
  int sp_for_switch = 0;
  i32 slice_qs_delta = 0;
  int disable_deblocking_idc = 0;
  int alpha_c0_offset = 0, beta_offset = 0;
  int slice_group_change_cycle = 0;
  // NAL-level info
  bool is_idr = false;
  int nal_ref_idc = 0;
  int nal_type = 0;
  size_t header_bits = 0;  // bit length of the slice header in the RBSP
};

// ---------------------------------------------------------------------------
// Macroblock record ("rtd"): every symbol needed to regenerate the MB's
// entropy-coded bits exactly. Coefficients are stored in SCAN (zigzag)
// order. Reference: decoded_macroblock.h:4-104.
// ---------------------------------------------------------------------------

// Canonical MB classes (mirrors the reference's 12-way recode,
// macroblock_model.cpp:647-693, with our own numbering).
enum MbClass : u8 {
  MB_I4x4 = 0,
  MB_I16x16 = 1,
  MB_I8x8 = 2,
  MB_P16x16 = 3,
  MB_P16x8 = 4,
  MB_P8x16 = 5,
  MB_P8x8 = 6,
  MB_P8x8REF0 = 7,
  MB_PCM = 8,
  MB_PSKIP = 11,
  MB_NUM_CLASSES = 12,
};

inline bool mb_is_intra(u8 c) {
  return c == MB_I4x4 || c == MB_I16x16 || c == MB_I8x8 || c == MB_PCM;
}
inline bool mb_is_inter(u8 c) {
  return c == MB_P16x16 || c == MB_P16x8 || c == MB_P8x16 || c == MB_P8x8 ||
         c == MB_P8x8REF0 || c == MB_PSKIP;
}

// P sub-mb types
enum SubMbType : u8 { SUB_8x8 = 0, SUB_8x4 = 1, SUB_4x8 = 2, SUB_4x4 = 3 };

struct MbRecord {
  u8 mb_class = MB_PSKIP;
  bool transform_8x8 = false;
  u8 cbp_luma = 0;    // 4 bits
  u8 cbp_chroma = 0;  // 0..2
  i8 dqp = 0;         // mb_qp_delta as coded (0 when no residual coded)
  u8 qp = 0;          // resulting luma QP (after delta)
  u8 i16_mode = 0;
  u8 chroma_mode = 0;
  u8 i4_modes[16] = {};  // resolved intra4x4 modes, decode order (or 4 for I8x8)
  u8 sub_types[4] = {};
  i8 ref_idx[4] = {};    // per 8x8 partition (list 0)
  i16 mvd[16][2] = {};   // per 4x4 block (decode order index), list 0
  // Residuals in scan order:
  i16 luma_dc[16] = {};      // I16x16 DC (4x4 zigzag of Hadamard block)
  i16 luma_ac[16][16] = {};  // per 4x4 block (raster block index), positions
                             // 0..15; for I16 MBs position 0 unused
  i16 luma_ac8[4][64] = {};  // 8x8-transform MBs: per 8x8 block zigzag
  i16 chroma_dc[2][4] = {};  // u,v 2x2 scan
  i16 chroma_ac[8][16] = {}; // 8 blocks (u0..3, v0..3), positions 1..15
  u8 pcm[384] = {};          // I_PCM raw samples
  // Parse-side bookkeeping (not serialized; recomputed on recode):
  u8 nnz[24] = {};           // total_coeff per sub-4x4: 16 luma + 4 u + 4 v
  // Decode-support only (decsupport.cc): absolute MVs per 4x4 cell
  i16 mv[16][2] = {};
};

// ---------------------------------------------------------------------------
// Shared per-picture parse state (the explicit "state transition" both
// compress and recode run; replaces the reference's trick of re-decoding
// synthesized bits, decode_slice.cpp:2891-2936).
// ---------------------------------------------------------------------------

struct MbState {
  bool decoded = false;
  u8 slice_id = 0xff;
  u8 mb_class = MB_PSKIP;
  bool transform_8x8 = false;
  u8 cbp_luma = 0, cbp_chroma = 0;
  i8 qp = 0;
  u8 nnz[24] = {};          // total_coeff cache (PCM: 16s)
  i8 i4_modes[16] = {};     // resolved modes per 4x4 in raster-in-MB order;
                            // -1 when MB is not I4x4/I8x8
  // CABAC contexts:
  u8 cbf_dc = 0;            // bit 0: I16 luma DC, 1: chroma U DC, 2: V DC
  i16 mvd[16][2] = {};      // per 4x4 cell raster-in-MB (partition-replicated)
  // Decode-support (filled only by the decode walker, decsupport.cc):
  i16 mv[16][2] = {};       // absolute quarter-pel MVs per 4x4 cell
  i8 ref_cell[16] = {-1, -1, -1, -1, -1, -1, -1, -1,
                     -1, -1, -1, -1, -1, -1, -1, -1};  // -1: intra/none
  i8 ref_idx[4] = {};       // per 8x8 quadrant
  u8 sub_types[4] = {};
  bool skip_flag = false;
  bool intra16 = false;
  u8 intra_chroma_mode = 0;
  i8 dqp = 0;
};

// Replicate an inter MB's per-partition ref/mvd into per-4x4 cells
// (raster-in-MB), the layout CABAC neighbor contexts consume.
void expand_inter_cells(const MbRecord& rec, i8 ref_cell[16], i16 mvd_cell[16][2]);

struct PicState {
  int mb_width = 0, mb_height = 0;
  std::vector<MbState> mbs;
  std::vector<u8> slice_group;  // FMO map (all 0 when num_slice_groups==1)
  int next_slice_id = 0;

  void reset(int w, int h) {
    mb_width = w;
    mb_height = h;
    mbs.assign(size_t(w) * h, MbState());
    next_slice_id = 0;
    if (slice_group.size() != size_t(w) * h) slice_group.assign(size_t(w) * h, 0);
  }
  MbState& at(int addr) { return mbs[addr]; }
  const MbState& at(int addr) const { return mbs[addr]; }
  int num_mbs() const { return mb_width * mb_height; }
};

// ---------------------------------------------------------------------------
// Parse entry points (params.cc)
// ---------------------------------------------------------------------------
Sps parse_sps(BitReader& br);
Pps parse_pps(BitReader& br, const std::map<int, Sps>& sps_map);
// Parses a slice header from `br` (positioned after the NAL header byte).
SliceHeader parse_slice_header(BitReader& br, int nal_ref_idc, int nal_type,
                               const std::map<int, Sps>& sps_map,
                               const std::map<int, Pps>& pps_map);

// FMO: fill pic.slice_group from pps+header (map types 0..6).
void compute_slice_group_map(const Sps& sps, const Pps& pps,
                             const SliceHeader& sh, PicState& pic);
// Next MB address in the same slice group (raster scan skipping other groups).
int next_mb_address(const PicState& pic, int addr);

}  // namespace h264pip
