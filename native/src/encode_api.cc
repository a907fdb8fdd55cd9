// Encoder entropy/NAL assembly: takes per-MB symbols (modes + quantized
// coefficients in scan order) produced by the JAX/numpy analysis side and
// packages a conformant Annex-B .264 stream through the same CAVLC writer
// the recode path uses.
//
// Reference parity: the entropy/NAL half of codec/encoder/core
// (au_set.cpp SPS/PPS writing, svc_encode_slice.cpp slice framing,
// svc_set_mb_syn_cavlc.cpp MB writing). Mode decision / transforms live
// in losslessh264_tpu/encoder.py (TPU side).
#include "bitio.h"
#include "cavlc.h"
#include "state.h"

#include <cstring>

using namespace h264pip;

namespace {

std::vector<u8> make_nal(int ref_idc, int type, const std::vector<u8>& rbsp) {
  std::vector<u8> out = {0, 0, 0, 1};
  out.push_back(u8((ref_idc << 5) | type));
  std::vector<u8> ebsp = rbsp_to_ebsp(rbsp);
  out.insert(out.end(), ebsp.begin(), ebsp.end());
  return out;
}

std::vector<u8> write_sps(int mb_w, int mb_h) {
  BitWriter bw;
  bw.put(66, 8);   // profile: baseline
  bw.put(0xc0, 8); // constraint set 0+1
  bw.put(30, 8);   // level 3.0
  bw.put_ue(0);    // sps id
  bw.put_ue(4);    // log2_max_frame_num = 8
  bw.put_ue(2);    // pic_order_cnt_type 2 (decode order)
  bw.put_ue(0);    // max_num_ref_frames
  bw.put_bit(0);   // gaps_in_frame_num
  bw.put_ue(u32(mb_w - 1));
  bw.put_ue(u32(mb_h - 1));
  bw.put_bit(1);   // frame_mbs_only
  bw.put_bit(1);   // direct_8x8_inference
  bw.put_bit(0);   // frame_cropping
  bw.put_bit(0);   // vui
  bw.rbsp_trailing_bits();
  return make_nal(3, 7, bw.bytes());
}

std::vector<u8> write_pps() {
  BitWriter bw;
  bw.put_ue(0);  // pps id
  bw.put_ue(0);  // sps id
  bw.put_bit(0); // CAVLC
  bw.put_bit(0); // bottom_field_pic_order
  bw.put_ue(0);  // num_slice_groups - 1
  bw.put_ue(0);  // num_ref_idx_l0_default - 1
  bw.put_ue(0);  // l1
  bw.put_bit(0); // weighted_pred
  bw.put(0, 2);  // weighted_bipred
  bw.put_se(0);  // pic_init_qp - 26
  bw.put_se(0);  // pic_init_qs - 26
  bw.put_se(0);  // chroma_qp_index_offset
  bw.put_bit(0); // deblocking_filter_control_present
  bw.put_bit(0); // constrained_intra
  bw.put_bit(0); // redundant_pic_cnt_present
  bw.rbsp_trailing_bits();
  return make_nal(3, 8, bw.bytes());
}

}  // namespace

extern "C" {

// Encode one all-intra IDR frame from per-MB symbol planes. Appends the
// frame's NALs (plus SPS/PPS when first) to a growing buffer.
// mb_class: 0 = I4x4, 1 = I16x16. Coefficients in scan order:
// luma_dc [n,16], luma_ac [n,16,16] (pos 0 unused for I16),
// chroma_dc [n,2,4], chroma_ac [n,8,16] (pos 0 unused).
int pip_encode_frame(int mb_w, int mb_h, int qp, int frame_idx, int idr_id,
                     const u8* mb_class, const u8* i16_mode,
                     const u8* chroma_mode, const i8* i4_modes,
                     const i16* luma_dc, const i16* luma_ac,
                     const i16* chroma_dc, const i16* chroma_ac,
                     int include_params, u8** out, size_t* out_size,
                     char* err, size_t err_cap) {
  try {
    int n = mb_w * mb_h;
    std::vector<u8> stream;
    if (include_params) {
      auto sps = write_sps(mb_w, mb_h);
      auto pps = write_pps();
      stream.insert(stream.end(), sps.begin(), sps.end());
      stream.insert(stream.end(), pps.begin(), pps.end());
    }
    // slice header (IDR, I slice, qp delta 26->qp)
    BitWriter bw;
    bw.put_ue(0);                 // first_mb_in_slice
    bw.put_ue(7);                 // slice_type I (all slices in pic)
    bw.put_ue(0);                 // pps id
    bw.put(frame_idx & 0xff, 8);  // frame_num (log2_max_frame_num = 8)
    bw.put_ue(u32(idr_id));       // idr_pic_id
    bw.put_bit(0);                // no_output_of_prior_pics
    bw.put_bit(0);                // long_term_reference_flag
    bw.put_se(qp - 26);           // slice_qp_delta
    size_t header_bits = bw.pos_bits();

    // slice data via the shared CAVLC writer
    Sps sps_s;
    sps_s.pic_width_in_mbs = mb_w;
    sps_s.pic_height_in_map_units = mb_h;
    sps_s.log2_max_frame_num = 8;
    Pps pps_s;
    SliceHeader sh;
    sh.slice_type = SLICE_I;
    sh.slice_qp = qp;
    sh.is_idr = true;
    sh.nal_ref_idc = 3;
    sh.nal_type = 5;
    sh.header_bits = header_bits;
    PicState pic;
    pic.reset(mb_w, mb_h);
    SliceCtx sc;
    sc.begin_slice(&sps_s, &pps_s, &sh, &pic);
    for (int addr = 0; addr < n; ++addr) {
      sc.begin_mb(addr);
      MbRecord rec;
      rec.mb_class = mb_class[addr] == 1 ? MB_I16x16 : MB_I4x4;
      rec.i16_mode = i16_mode[addr];
      rec.chroma_mode = chroma_mode[addr];
      memcpy(rec.i4_modes, i4_modes + addr * 16, 16);
      memcpy(rec.luma_dc, luma_dc + addr * 16, 16 * 2);
      memcpy(rec.luma_ac, luma_ac + addr * 256, 256 * 2);
      memcpy(rec.chroma_dc, chroma_dc + addr * 8, 8 * 2);
      memcpy(rec.chroma_ac, chroma_ac + addr * 128, 128 * 2);
      derive_nnz(rec);
      // CBP derivation from coefficients
      if (rec.mb_class == MB_I16x16) {
        u8 cbp = 0;
        for (int b8 = 0; b8 < 4; ++b8) {
          static const int kTL[4] = {0, 2, 8, 10};
          int tl = kTL[b8];
          if (rec.nnz[tl] || rec.nnz[tl + 1] || rec.nnz[tl + 4] ||
              rec.nnz[tl + 5])
            cbp = 15;
        }
        rec.cbp_luma = cbp;
      } else {
        u8 cbp = 0;
        for (int b8 = 0; b8 < 4; ++b8) {
          static const int kTL[4] = {0, 2, 8, 10};
          int tl = kTL[b8];
          if (rec.nnz[tl] || rec.nnz[tl + 1] || rec.nnz[tl + 4] ||
              rec.nnz[tl + 5])
            cbp |= u8(1 << b8);
        }
        rec.cbp_luma = cbp;
      }
      bool cdc = false, cac = false;
      for (int i = 0; i < 8; ++i)
        if (chroma_dc[addr * 8 + i]) cdc = true;
      for (int i = 16; i < 24; ++i)
        if (rec.nnz[i]) cac = true;
      rec.cbp_chroma = cac ? 2 : (cdc ? 1 : 0);
      rec.dqp = 0;
      write_mb_cavlc(bw, sc, rec);
      if (rec.cbp_luma || rec.cbp_chroma || rec.mb_class == MB_I16x16)
        sc.apply_dqp(rec.dqp);
      else
        sc.last_dqp = 0;
      rec.qp = u8(sc.cur_qp);
      sc.commit(rec);
    }
    bw.rbsp_trailing_bits();
    auto nal = make_nal(3, 5, bw.bytes());
    stream.insert(stream.end(), nal.begin(), nal.end());

    *out = static_cast<u8*>(malloc(stream.size()));
    memcpy(*out, stream.data(), stream.size());
    *out_size = stream.size();
    return 0;
  } catch (const std::exception& e) {
    if (err && err_cap) {
      strncpy(err, e.what(), err_cap - 1);
      err[err_cap - 1] = 0;
    }
    return 1;
  }
}

}  // extern "C"
