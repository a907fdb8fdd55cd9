// Decode-support: parse a .264 stream into per-frame symbol planes for
// the JAX/TPU pixel pipeline (losslessh264_tpu/decoder.py). Covers motion
// vector prediction (ISO 14496-10 8.4.1) and DPB / reference list
// management (8.2.4, 8.2.5) on the host; everything pixel-domain happens
// on the TPU.
//
// Reference parity: mv_pred.cpp (PredMv/PredPSkipMvFromNeighbor),
// manage_dec_ref.cpp, pic_queue.cpp, decoder_core.cpp InitRefPicList.
#pragma once

#include "h264_syntax.h"
#include "state.h"

namespace h264pip {

// Per-frame symbol planes, laid out for direct numpy export.
struct FramePlanes {
  int mb_w = 0, mb_h = 0;
  int poc = 0;
  bool is_ref = false;
  bool is_idr = false;
  int crop[4] = {};  // SPS frame_crop l/r/t/b (crop units)
  // per-MB (n = mb_w*mb_h):
  std::vector<u8> mb_class;
  std::vector<u8> qp;
  std::vector<u8> cbp_luma, cbp_chroma;
  std::vector<u8> transform8;
  std::vector<u8> i16_mode, chroma_mode;
  std::vector<i8> i4_modes;      // n*16, raster cells (-1 none)
  std::vector<i16> luma_ac;      // n*16*16, raster within 4x4 (de-zigzagged)
  std::vector<i16> luma_dc;      // n*16, raster of the DC 4x4
  std::vector<i16> luma8;        // n*4*64, raster within 8x8
  std::vector<i16> chroma_ac;    // n*8*16, raster (u0..3, v0..3)
  std::vector<i16> chroma_dc;    // n*8 (2x2 u then v)
  std::vector<i16> mv;           // n*16*2 absolute quarter-pel
  std::vector<i16> ref_frame;    // n*16: output index of reference, -1 intra
  // Raw per-cell ref_idx as stored by the parser (-1 intra). Deblock bS
  // must compare THESE, not resolved pictures: the reference decoder's
  // MB_BS_MV / SMB_EDGE_MV (deblocking.cpp:58,66) diff ref indices, which
  // diverges from spec 8.7.2.1 when two indices resolve to one picture
  // (e.g. out-of-range idx falling back through GetRefPic's NULL check).
  std::vector<i8> ref_idx;       // n*16
  // 1 where the cell is the TOP-LEFT of a motion partition — the cells
  // the reference's MV-copy concealment averages over
  // (error_concealment.cpp GetAvilInfoFromCorrectMb:247-355)
  std::vector<u8> part_tl;       // n*16
  // frame-level L0 reference list (ref_idx -> output index, -1 pad) from
  // the last P slice — what EC's pECRefPic[] indexes. NB: truncated to
  // num_ref_idx_l0_active — NOT the full live set (see dpb_live).
  int ref_list[18];
  int n_ref_list = 0;
  // the FULL DPB after this frame's reference marking (sliding window /
  // MMCO applied): output indices of every picture still referenceable
  // by future frames. The pixel layer's ring eviction must keep these
  // live — ref_list alone drops long-term pics outside the active L0
  // range (ADVICE r3: LTR marked >18 frames before recovery was
  // evicted and silently mispredicted).
  int dpb_live[17];
  int n_dpb_live = 0;
  std::vector<u8> pcm;           // n*384
  std::vector<u8> slice_id;      // per MB
  std::vector<u8> deblock_idc;   // per MB (from its slice)
  // Error resilience (reference: error_concealment.cpp): MBs whose slice
  // failed to parse keep decoded=0; the pixel layer conceals them
  // (frame/slice/MV copy) instead of failing the frame.
  std::vector<u8> decoded;       // per MB, 1 = parsed OK
  int lost_slices = 0;           // slices dropped by parse errors
  std::vector<i8> alpha_off, beta_off;
  // Explicit weighted prediction (spec 7.3.3.2 / 8.4.2.3), resolved per
  // cell from the slice's pred_weight_table and the cell's ref_idx.
  // Layout per luma cell: (weight, offset, log2denom); denom -1 = none.
  // The chroma mask mirrors the reference decoder's quarter-size chroma
  // weighting region (rec_mb.cpp WeightPrediction: iBlkWidth>>2 — a
  // reference bug we reproduce for output parity): per chroma pixel, 8x8
  // raster per MB, 1 = weighted.
  std::vector<i16> wp_luma;      // n*16*3
  std::vector<i16> wp_cb, wp_cr; // n*16*3 each
  std::vector<u8> wp_cmask;      // n*64
  // per-frame:
  int chroma_qp_offset = 0, second_chroma_qp_offset = 0;
  u8 intra_avail_mode = 0;  // constrained_intra_pred flag
  bool use_scaling = false;
  u8 scaling4[6][16] = {};
  u8 scaling8[6][64] = {};
};

// Encoder-side MV helpers (same 8.4.1 machinery the decode path uses):
// predicted MV for a 16x16 partition / the P_Skip MV, given the current
// SliceCtx state (neighbors committed). Used by encode_api.cc.
void predict_mv_p16x16(SliceCtx& sc, i8 ref, i16 out[2]);
void predict_mv_skip(SliceCtx& sc, i16 out[2]);
// Fill absolute MV cells for a record whose mvd/ref_idx are set (pushes
// into sc.cur so commit() stores them for neighbor prediction).
void derive_mvs_record(SliceCtx& sc, MbRecord& rec);
void compute_p8x8_mvds(SliceCtx& sc, const i16 mv8[4][2], MbRecord& rec);
void compute_p16x8_mvds(SliceCtx& sc, const i16 mv2[2][2], MbRecord& rec);
void compute_p8x16_mvds(SliceCtx& sc, const i16 mv2[2][2], MbRecord& rec);

struct SymbolDecoderImpl;

// Streaming decoder: open once, pull frames in decode order.
class SymbolDecoder {
 public:
  SymbolDecoder(const u8* data, size_t size);
  // Returns false at end of stream. Fills `out`.
  bool next_frame(FramePlanes* out);

 private:
  std::shared_ptr<SymbolDecoderImpl> impl_;
};

}  // namespace h264pip
