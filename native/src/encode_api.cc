// Encoder entropy/NAL assembly: takes per-MB symbols (modes, motion
// vectors and quantized coefficients in scan order) produced by the
// JAX/numpy analysis side and packages a conformant Annex-B .264 stream
// through the same CAVLC writer the recode path uses.
//
// Reference parity: the entropy/NAL half of codec/encoder/core
// (au_set.cpp SPS/PPS writing, svc_encode_slice.cpp slice framing +
// skip-run emission, svc_set_mb_syn_cavlc.cpp MB writing). Mode decision,
// motion estimation and transforms live in losslessh264_tpu/encoder.py +
// ops/me.py (TPU side).
//
// The PPS sets deblocking_filter_control_present so each slice header
// carries disable_deblocking_filter_idc: 1 when the caller keeps its
// in-loop recon unfiltered, 0/2 when it runs the loop filter
// encoder-side (encoder_jax deblock=True; the filtered planes then match
// any conformant decoder's output bit-exactly).
#include "bitio.h"
#include "cabac_mb.h"
#include "cavlc.h"
#include "decsupport.h"
#include "state.h"

#include <algorithm>
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

std::vector<u8> write_sps(int mb_w, int mb_h, int crop_r, int crop_b,
                          int num_refs, int sps_id = 0) {
  // crop_r/crop_b in crop units (2 luma samples each: 4:2:0
  // frame_mbs_only, 7.4.2.1.1) — non-multiple-of-16 sources are padded
  // to whole MBs and cropped back here
  BitWriter bw;
  bw.put(66, 8);   // profile: baseline
  bw.put(0xc0, 8); // constraint set 0+1
  bw.put(30, 8);   // level 3.0
  bw.put_ue(u32(sps_id));
  bw.put_ue(4);    // log2_max_frame_num = 8
  bw.put_ue(2);    // pic_order_cnt_type 2 (decode order)
  bw.put_ue(u32(num_refs));  // max_num_ref_frames (2 with an LTR slot)
  bw.put_bit(0);   // gaps_in_frame_num
  bw.put_ue(u32(mb_w - 1));
  bw.put_ue(u32(mb_h - 1));
  bw.put_bit(1);   // frame_mbs_only
  bw.put_bit(1);   // direct_8x8_inference
  if (crop_r || crop_b) {
    bw.put_bit(1); // frame_cropping
    bw.put_ue(0);
    bw.put_ue(u32(crop_r));
    bw.put_ue(0);
    bw.put_ue(u32(crop_b));
  } else {
    bw.put_bit(0); // frame_cropping
  }
  bw.put_bit(0);   // vui
  bw.rbsp_trailing_bits();
  return make_nal(3, 7, bw.bytes());
}

std::vector<u8> write_pps(bool cabac, int param_id = 0) {
  BitWriter bw;
  bw.put_ue(u32(param_id));  // pps id
  bw.put_ue(u32(param_id));  // sps id
  bw.put_bit(cabac ? 1 : 0);  // entropy_coding_mode_flag
  bw.put_bit(0); // bottom_field_pic_order
  bw.put_ue(0);  // num_slice_groups - 1
  bw.put_ue(0);  // num_ref_idx_l0_default - 1
  bw.put_ue(0);  // l1
  bw.put_bit(0); // weighted_pred
  bw.put(0, 2);  // weighted_bipred
  bw.put_se(0);  // pic_init_qp - 26
  bw.put_se(0);  // pic_init_qs - 26
  bw.put_se(0);  // chroma_qp_index_offset
  bw.put_bit(1); // deblocking_filter_control_present
  bw.put_bit(0); // constrained_intra
  bw.put_bit(0); // redundant_pic_cnt_present
  bw.rbsp_trailing_bits();
  return make_nal(3, 8, bw.bytes());
}

// CBP from derived nnz + chroma coeffs (rec.nnz must be filled).
void derive_cbp(MbRecord& rec, const i16* chroma_dc, int addr) {
  static const int kTL[4] = {0, 2, 8, 10};
  u8 cbp = 0;
  for (int b8 = 0; b8 < 4; ++b8) {
    int tl = kTL[b8];
    if (rec.nnz[tl] || rec.nnz[tl + 1] || rec.nnz[tl + 4] || rec.nnz[tl + 5])
      cbp |= u8(1 << b8);
  }
  rec.cbp_luma = rec.mb_class == MB_I16x16 ? (cbp ? 15 : 0) : cbp;
  bool cdc = false, cac = false;
  for (int i = 0; i < 8; ++i)
    if (chroma_dc[addr * 8 + i]) cdc = true;
  for (int i = 16; i < 24; ++i)
    if (rec.nnz[i]) cac = true;
  rec.cbp_chroma = cac ? 2 : (cdc ? 1 : 0);
}

}  // namespace

extern "C" {

// Encode one frame from per-MB symbol planes. slice_type: 1 = IDR intra,
// 0 = P. mb_class uses the MbClass codes (0 I4x4, 1 I16x16, 3 P16x16,
// 11 P_Skip). mv: n*2 absolute quarter-pel (P16x16/P_Skip MBs; the skip
// MV must equal the 8.4.1.1 predictor — the caller guarantees it).
// Coefficients in scan order: luma_dc [n,16] (I16 only), luma_ac
// [n,16,16] (pos 0 unused for I16), chroma_dc [n,2,4], chroma_ac
// [n,8,16] (pos 0 unused).
// mb_qp: optional per-MB absolute luma QP (adaptive quantization); NULL
// means flat slice QP. mb_qp_delta is only codable on MBs with coded
// residual (cbp != 0 or I16x16) — on other MBs the caller's value is
// ignored (they carry no coefficients, so no quant mismatch arises; the
// QP_prev chain simply continues, 7.4.5).
// deblock_idc: disable_deblocking_filter_idc written per slice (0 filter
// everything, 1 off, 2 don't cross slice boundaries). out_qp (optional,
// [n]): the final per-MB luma QP after the 7.4.5 chain — what a decoder
// will see, needed by the caller's in-loop deblock QP averaging.
// ltr_flags (long-term reference support, the reference's LTR feature,
// ref_list_mgr_svc.cpp): bit0 = LTR mode (SPS advertises 2 ref frames;
// IDRs carry long_term_reference_flag=1), bit1 = mark THIS ref frame as
// the long-term reference (MMCO 4+6), bit2 = predict this P frame from
// the LTR (RPLR putting long_term_pic_num 0 first).
int pip_encode_frame(int mb_w, int mb_h, int qp, int frame_num, int idr_id,
                     int slice_type, const u8* mb_class, const i16* mv,
                     const u8* i16_mode, const u8* chroma_mode,
                     const i8* i4_modes, const i16* luma_dc,
                     const i16* luma_ac, const i16* chroma_dc,
                     const i16* chroma_ac, const u8* mb_qp,
                     const i16* mv8 /* [n,4,2] P8x8 partition MVs */,
                     int include_params, int cabac, int n_slices,
                     int deblock_idc, int crop_r, int crop_b, int is_ref,
                     int ltr_flags, int n_refs,
                     int sps_refs /* SPS max_num_ref_frames override, 0 = derive */,
                     int rplr_diff /* >0: RPLR idc0 abs_diff_pic_num putting
                                      that short-term pic first in L0
                                      (hierarchical-P temporal layers) */,
                     const int* mmco_drops /* MMCO 1 diff_of_pic_nums_minus1
                                              values: evict stale short-term
                                              refs (hierarchical-P) */,
                     int n_mmco,
                     int param_id /* SPS/PPS id for this stream (spatial
                                     simulcast layers carry distinct ids) */,
                     const i8* ref_plane /* per-MB L0 ref_idx (P16x16) */,
                     const int* row_slice /* [mb_h] monotone slice index
                                             per MB row; overrides
                                             n_slices (dynamic
                                             size-limited slicing —
                                             reference SM_DYN_SLICE,
                                             codec_app_def.h:275) */,
                     unsigned* out_row_bits /* optional [mb_h]: bits each
                                               MB row cost inside its
                                               slice (CAVLC exact; CABAC
                                               even split) — the
                                               caller's size predictor
                                               for next frame's dynamic
                                               slice map */,
                     u8* out_qp, u8** out,
                     size_t* out_size, char* err, size_t err_cap) {
  try {
    bool is_idr = slice_type != 0;
    if (n_refs < 1) n_refs = 1;
    bool ltr_mode = (ltr_flags & 1) != 0;
    bool ltr_mark = (ltr_flags & 2) != 0 && is_ref && !is_idr;
    bool ltr_use = (ltr_flags & 4) != 0 && !is_idr;
    int sps_max_refs = sps_refs > 0
                           ? sps_refs
                           : std::max(n_refs, ltr_mode ? 2 : 1);
    if (n_slices < 1) n_slices = 1;
    if (n_slices > mb_h) n_slices = mb_h;
    std::vector<u8> stream;
    if (include_params) {
      auto sps = write_sps(mb_w, mb_h, crop_r, crop_b, sps_max_refs,
                           param_id);
      auto pps = write_pps(cabac != 0, param_id);
      stream.insert(stream.end(), sps.begin(), sps.end());
      stream.insert(stream.end(), pps.begin(), pps.end());
    }
    Sps sps_s;
    sps_s.pic_width_in_mbs = mb_w;
    sps_s.pic_height_in_map_units = mb_h;
    sps_s.log2_max_frame_num = 8;
    sps_s.max_num_ref_frames = sps_max_refs;
    Pps pps_s;
    if (cabac) pps_s.entropy_coding_mode = 1;
    PicState pic;
    pic.reset(mb_w, mb_h);
    PicState pic_mirror;  // CABAC writer's independent state walk

    // slice split: explicit per-row map (dynamic size-limited slicing,
    // reference SM_DYN_SLICE) or row-aligned fixed count (reference
    // SM_FIXEDSLCNUM_SLICE, slice_multi_threading.cpp load split)
    std::vector<int> bounds;
    if (row_slice) {
      bounds.push_back(0);
      for (int r = 1; r < mb_h; ++r)
        if (row_slice[r] != row_slice[r - 1]) bounds.push_back(r);
    } else {
      int rows_per = (mb_h + n_slices - 1) / n_slices;
      for (int r0 = 0; r0 < mb_h; r0 += rows_per) bounds.push_back(r0);
    }
    int n_bounds = int(bounds.size());
    for (int si = 0; si < n_bounds; ++si) {
    int r0 = bounds[si];
    int r1 = si + 1 < n_bounds ? bounds[si + 1] : mb_h;
    int first_mb = r0 * mb_w;
    int end_mb = r1 * mb_w;
    // slice header
    BitWriter bw;
    bw.put_ue(u32(first_mb));         // first_mb_in_slice
    bw.put_ue(is_idr ? 7 : 5);        // slice_type (I / P, all slices)
    bw.put_ue(u32(param_id));         // pps id
    bw.put(frame_num & 0xff, 8);      // frame_num
    if (is_idr) {
      bw.put_ue(u32(idr_id));         // idr_pic_id
      bw.put_bit(0);                  // no_output_of_prior_pics
      // in LTR mode the IDR itself becomes the initial long-term ref
      bw.put_bit(ltr_mode ? 1 : 0);   // long_term_reference_flag
    } else {
      if (n_refs > 1) {
        bw.put_bit(1);                // num_ref_idx_active_override
        bw.put_ue(u32(n_refs - 1));   // num_ref_idx_l0_active_minus1
      } else {
        bw.put_bit(0);                // num_ref_idx_active_override
      }
      if (ltr_use) {
        bw.put_bit(1);                // ref_pic_list_modification_l0
        bw.put_ue(2);                 // idc 2: long_term_pic_num follows
        bw.put_ue(0);                 // long_term_pic_num = 0
        bw.put_ue(3);                 // idc 3: end of modifications
      } else if (rplr_diff > 0) {
        // hierarchical-P: bring the dyadic parent (an older short-term
        // pic) to L0[0] (8.2.4.3.1 idc 0: pred -= abs_diff_pic_num)
        bw.put_bit(1);                // ref_pic_list_modification_l0
        bw.put_ue(0);                 // idc 0: subtract abs_diff_pic_num
        bw.put_ue(u32(rplr_diff - 1));  // abs_diff_pic_num_minus1
        bw.put_ue(3);                 // idc 3: end of modifications
      } else {
        bw.put_bit(0);                // ref_pic_list_modification
      }
      if (is_ref) {                   // dec_ref_pic_marking only when
        if (ltr_mark) {               // nal_ref_idc != 0 (7.3.3)
          bw.put_bit(1);              // adaptive marking
          bw.put_ue(4);               // MMCO 4: max_long_term_frame_idx
          bw.put_ue(1);               //   plus1 = 1 (idx 0 allowed)
          bw.put_ue(6);               // MMCO 6: current -> LT idx 0
          bw.put_ue(0);
          bw.put_ue(0);               // MMCO 0: end
        } else if (n_mmco > 0) {
          // hierarchical-P: evict short-term refs whose temporal layer
          // is >= this frame's — no future frame predicts from them
          bw.put_bit(1);              // adaptive marking
          for (int m = 0; m < n_mmco; ++m) {
            bw.put_ue(1);             // MMCO 1: drop short-term
            bw.put_ue(u32(mmco_drops[m]));  // diff_of_pic_nums_minus1
          }
          bw.put_ue(0);               // MMCO 0: end
        } else {
          bw.put_bit(0);
        }
      }
    }
    if (cabac && !is_idr) bw.put_ue(0);  // cabac_init_idc
    bw.put_se(qp - 26);               // slice_qp_delta
    bw.put_ue(u32(deblock_idc));      // disable_deblocking_filter_idc
    if (deblock_idc != 1) {
      bw.put_se(0);                   // slice_alpha_c0_offset_div2
      bw.put_se(0);                   // slice_beta_offset_div2
    }
    size_t header_bits = bw.pos_bits();

    SliceHeader sh;
    sh.slice_type = is_idr ? SLICE_I : SLICE_P;
    sh.slice_qp = qp;
    sh.is_idr = is_idr;
    // non-reference P frames (temporal layer > 0) carry nal_ref_idc 0
    sh.nal_ref_idc = is_idr ? 3 : (is_ref ? 2 : 0);
    sh.nal_type = is_idr ? 5 : 1;
    sh.frame_num = frame_num & 0xff;
    sh.num_ref_idx_l0_active = is_idr ? 1 : n_refs;
    sh.disable_deblocking_idc = u8(deblock_idc);
    sh.header_bits = header_bits;
    sh.cabac_init_idc = 0;
    sh.first_mb_in_slice = first_mb;
    SliceCtx sc;
    sc.begin_slice(&sps_s, &pps_s, &sh, &pic);

    std::vector<u8> header_bytes;
    {
      BitWriter hw;
      hw.append(bw);
      while (!hw.byte_aligned()) hw.put_bit(0);
      header_bytes = hw.take();
    }
    std::vector<MbRecord> recs;  // CABAC: records for cabac_write_slice
    std::vector<size_t> row_end_bits;  // CAVLC row cost tracking
    int skip_run = 0;
    // skip-run bits are deferred until the run flushes; a row-end
    // snapshot of raw pos_bits() would charge skip-heavy rows ~0 and
    // dump the whole ue(run) on the flushing row, skewing the dynamic
    // slice planner. Attribute the run's current ue() length at every
    // row end instead (monotonic: the run only grows between flushes).
    auto ue_len = [](unsigned v) {
      unsigned k = 0;
      while (((v + 1) >> (k + 1)) != 0) ++k;
      return size_t(2 * k + 1);
    };
    auto row_snapshot = [&]() {
      row_end_bits.push_back(bw.pos_bits() +
                             (skip_run > 0 ? ue_len(u32(skip_run)) : 0));
    };
    for (int addr = first_mb; addr < end_mb; ++addr) {
      MbClass cl = MbClass(mb_class[addr]);
      if (cl == MB_PSKIP) {
        PIP_CHECK(!is_idr, "P_Skip in IDR frame");
        sc.begin_mb(addr);
        MbRecord skip;
        skip.mb_class = MB_PSKIP;
        derive_mvs_record(sc, skip);
        skip.qp = u8(sc.cur_qp);
        sc.last_dqp = 0;
        if (out_qp) out_qp[addr] = skip.qp;
        sc.commit(skip);
        if (cabac) recs.push_back(skip);
        ++skip_run;
        if ((addr + 1) % mb_w == 0) row_snapshot();
        continue;
      }
      if (!is_idr && !cabac) {
        bw.put_ue(u32(skip_run));
        skip_run = 0;
      }
      sc.begin_mb(addr);
      MbRecord rec;
      rec.mb_class = cl;
      rec.i16_mode = i16_mode[addr];
      rec.chroma_mode = chroma_mode[addr];
      memcpy(rec.i4_modes, i4_modes + addr * 16, 16);
      memcpy(rec.luma_dc, luma_dc + addr * 16, 16 * 2);
      memcpy(rec.luma_ac, luma_ac + addr * 256, 256 * 2);
      memcpy(rec.chroma_dc, chroma_dc + addr * 8, 8 * 2);
      memcpy(rec.chroma_ac, chroma_ac + addr * 128, 128 * 2);
      if (cl == MB_P16x16) {
        i8 r0 = ref_plane ? ref_plane[addr] : i8(0);
        PIP_CHECK(r0 >= 0 && r0 < n_refs, "ref_idx out of range");
        rec.ref_idx[0] = r0;
        i16 pred[2];
        predict_mv_p16x16(sc, r0, pred);
        rec.mvd[0][0] = i16(mv[addr * 2 + 0] - pred[0]);
        rec.mvd[0][1] = i16(mv[addr * 2 + 1] - pred[1]);
      } else if (cl == MB_P8x8) {
        PIP_CHECK(mv8 != nullptr, "P8x8 MB without mv8 plane");
        i8 r0 = ref_plane ? ref_plane[addr] : i8(0);
        for (int i = 0; i < 4; ++i) {
          rec.ref_idx[i] = r0;
          rec.sub_types[i] = 0;  // SUB_8x8
        }
        i16 pm[4][2];
        memcpy(pm, mv8 + addr * 8, sizeof(pm));
        compute_p8x8_mvds(sc, pm, rec);
      } else if (cl == MB_P16x8 || cl == MB_P8x16) {
        PIP_CHECK(mv8 != nullptr, "two-partition MB without mv plane");
        i8 r0 = ref_plane ? ref_plane[addr] : i8(0);
        rec.ref_idx[0] = rec.ref_idx[1] = r0;
        i16 pm[2][2];
        memcpy(pm, mv8 + addr * 8, sizeof(pm));  // partitions in slots 0,1
        if (cl == MB_P16x8)
          compute_p16x8_mvds(sc, pm, rec);
        else
          compute_p8x16_mvds(sc, pm, rec);
      }
      derive_nnz(rec);
      derive_cbp(rec, chroma_dc, addr);
      rec.dqp = 0;
      if (mb_qp && (rec.cbp_luma || rec.cbp_chroma ||
                    rec.mb_class == MB_I16x16)) {
        int want = mb_qp[addr];
        PIP_CHECK(want >= 0 && want <= 51, "mb_qp out of range");
        int d = (want - sc.cur_qp + 78) % 52 - 26;  // wrap to [-26, 25]
        rec.dqp = i8(d);
      }
      if (!cabac) write_mb_cavlc(bw, sc, rec);
      if (rec.cbp_luma || rec.cbp_chroma || rec.mb_class == MB_I16x16)
        sc.apply_dqp(rec.dqp);
      else
        sc.last_dqp = 0;
      rec.qp = u8(sc.cur_qp);
      if (out_qp) out_qp[addr] = rec.qp;
      if (mb_is_inter(rec.mb_class)) derive_mvs_record(sc, rec);
      sc.commit(rec);
      if (cabac) recs.push_back(rec);
      if ((addr + 1) % mb_w == 0) row_snapshot();
    }
    std::vector<u8> rbsp;
    if (cabac) {
      // re-run the shared state walk inside the CABAC writer on a fresh
      // picture mirror (same two-pass structure as the recode path)
      if (si == 0) pic_mirror.reset(mb_w, mb_h);
      SliceCtx sc2;
      sc2.begin_slice(&sps_s, &pps_s, &sh, &pic_mirror);
      rbsp = cabac_write_slice(recs, sc2, sh, header_bytes.data(),
                               header_bits);
    } else {
      if (!is_idr && skip_run > 0) bw.put_ue(u32(skip_run));
      bw.rbsp_trailing_bits();
      rbsp = bw.bytes();
    }
    auto nal = make_nal(sh.nal_ref_idc, sh.nal_type, rbsp);
    stream.insert(stream.end(), nal.begin(), nal.end());
    if (out_row_bits) {
      int nrows = r1 - r0;
      size_t nal_bits = nal.size() * 8;
      if (!cabac) {
        // exact per-row split of the slice payload; NAL wrap, trailing
        // bits and any deferred final skip-run land on the last row
        size_t prev = 0;
        size_t covered = 0;
        for (int r = 0; r < nrows; ++r) {
          out_row_bits[r0 + r] = unsigned(row_end_bits[r] - prev);
          covered += row_end_bits[r] - prev;
          prev = row_end_bits[r];
        }
        if (nal_bits > covered)
          out_row_bits[r1 - 1] += unsigned(nal_bits - covered);
      } else {
        // CABAC encodes the slice as one unit: even split (predictor
        // precision only — the caller re-measures every frame)
        unsigned per = unsigned(nal_bits / size_t(nrows));
        for (int r = r0; r < r1; ++r) out_row_bits[r] = per;
      }
    }
    }  // slice loop

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

// Query the P_Skip / P16x16 predicted MVs for every MB of a frame given
// the per-MB decisions so far is not exposed; the Python side instead
// mirrors prediction by calling pip_encode_mv_preds on the final class
// plane before writing: for each MB in raster order it commits the
// caller's decision and reports (skip_mv, p16_pred) BEFORE that MB's
// decision is applied. This lets the encoder make skip decisions that
// are consistent with 8.4.1.1 in one native pass.
// classes: same codes as pip_encode_frame. mv: absolute qpel per MB
// (used to update prediction state). Outputs: skip_pred[n*2],
// p16_pred[n*2].
int pip_encode_mv_preds(int mb_w, int mb_h, int n_slices,
                        const int* row_slice /* optional [mb_h] dynamic
                                                slice map (SM_DYN_SLICE);
                                                overrides n_slices */,
                        const u8* mb_class,
                        const i16* mv, const i16* mv8, const i8* ref_plane,
                        i16* skip_pred,
                        i16* p16_pred, char* err, size_t err_cap) {
  try {
    int n = mb_w * mb_h;
    if (n_slices < 1) n_slices = 1;
    if (n_slices > mb_h) n_slices = mb_h;
    int rows_per = (mb_h + n_slices - 1) / n_slices;
    Sps sps_s;
    sps_s.pic_width_in_mbs = mb_w;
    sps_s.pic_height_in_map_units = mb_h;
    sps_s.max_num_ref_frames = 1;
    Pps pps_s;
    SliceHeader sh;
    sh.slice_type = SLICE_P;
    sh.nal_ref_idc = 2;
    sh.nal_type = 1;
    PicState pic;
    pic.reset(mb_w, mb_h);
    SliceCtx sc;
    sc.begin_slice(&sps_s, &pps_s, &sh, &pic);
    for (int addr = 0; addr < n; ++addr) {
      bool new_slice =
          row_slice
              ? (addr > 0 && addr % mb_w == 0 &&
                 row_slice[addr / mb_w] != row_slice[addr / mb_w - 1])
              : (addr > 0 && addr % (rows_per * mb_w) == 0);
      if (new_slice)
        sc.begin_slice(&sps_s, &pps_s, &sh, &pic);  // new slice boundary
      sc.begin_mb(addr);
      i16 sp[2], pp[2];
      predict_mv_skip(sc, sp);
      predict_mv_p16x16(sc, 0, pp);
      skip_pred[addr * 2] = sp[0];
      skip_pred[addr * 2 + 1] = sp[1];
      p16_pred[addr * 2] = pp[0];
      p16_pred[addr * 2 + 1] = pp[1];
      MbRecord rec;
      rec.mb_class = MbClass(mb_class[addr]);
      if (rec.mb_class == MB_P16x16) {
        rec.ref_idx[0] = ref_plane ? ref_plane[addr] : i8(0);
        i16 ppr[2] = {pp[0], pp[1]};
        if (rec.ref_idx[0] != 0)  // predictor is ref-idx dependent
          predict_mv_p16x16(sc, rec.ref_idx[0], ppr);
        rec.mvd[0][0] = i16(mv[addr * 2] - ppr[0]);
        rec.mvd[0][1] = i16(mv[addr * 2 + 1] - ppr[1]);
      } else if (rec.mb_class == MB_P8x8 && mv8) {
        i8 r0 = ref_plane ? ref_plane[addr] : i8(0);
        for (int i = 0; i < 4; ++i) {
          rec.ref_idx[i] = r0;
          rec.sub_types[i] = 0;
        }
        i16 pm[4][2];
        memcpy(pm, mv8 + addr * 8, sizeof(pm));
        compute_p8x8_mvds(sc, pm, rec);
      } else if ((rec.mb_class == MB_P16x8 || rec.mb_class == MB_P8x16)
                 && mv8) {
        i8 r0 = ref_plane ? ref_plane[addr] : i8(0);
        rec.ref_idx[0] = rec.ref_idx[1] = r0;
        i16 pm[2][2];
        memcpy(pm, mv8 + addr * 8, sizeof(pm));
        if (rec.mb_class == MB_P16x8)
          compute_p16x8_mvds(sc, pm, rec);
        else
          compute_p8x16_mvds(sc, pm, rec);
      }
      if (mb_is_inter(rec.mb_class)) derive_mvs_record(sc, rec);
      sc.commit(rec);
    }
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
