#include "state.h"

#include "tables.h"

namespace h264pip {

// nnz lookup helper: luma blocks 0..15 (raster), chroma u 16..19, v 20..23.
static inline int mb_nnz(const MbState& m, int idx) {
  if (m.mb_class == MB_PCM) return 16;
  return m.nnz[idx];
}

int SliceCtx::nC_luma(int blk) const {
  int bx = blk & 3, by = blk >> 2;
  int nA = -1, nB = -1;  // -1: unavailable
  if (bx > 0) {
    nA = cur.nnz[blk - 1];
  } else {
    const MbState* A = nbr(addr_left());
    if (A) nA = mb_nnz(*A, by * 4 + 3);
  }
  if (by > 0) {
    nB = cur.nnz[blk - 4];
  } else {
    const MbState* B = nbr(addr_above());
    if (B) nB = mb_nnz(*B, 12 + bx);
  }
  if (nA >= 0 && nB >= 0) return (nA + nB + 1) >> 1;
  if (nA >= 0) return nA;
  if (nB >= 0) return nB;
  return 0;
}

int SliceCtx::nC_chroma(int c, int blk) const {
  int base = 16 + c * 4;
  int bx = blk & 1, by = blk >> 1;
  int nA = -1, nB = -1;
  if (bx > 0) {
    nA = cur.nnz[base + blk - 1];
  } else {
    const MbState* A = nbr(addr_left());
    if (A) nA = mb_nnz(*A, base + by * 2 + 1);
  }
  if (by > 0) {
    nB = cur.nnz[base + blk - 2];
  } else {
    const MbState* B = nbr(addr_above());
    if (B) nB = mb_nnz(*B, base + 2 + bx);
  }
  if (nA >= 0 && nB >= 0) return (nA + nB + 1) >> 1;
  if (nA >= 0) return nA;
  if (nB >= 0) return nB;
  return 0;
}

// Intra mode of a neighboring 4x4 block position; -1 if the covering MB is
// unavailable, else the mode (DC=2 substituted for non-I4x4/I8x8 MBs).
// Under constrained_intra_pred an available INTER neighbor contributes -1
// (forcing the DC predictor), while I16/PCM still contribute 2 — the
// reference's WelsFillCacheConstrain1IntraNxN vs Constrain0 distinction
// (parse_mb_syn_cavlc.cpp:158-230). Getting this wrong decodes different
// (still self-consistent, so roundtrip-exact) modes than the reference
// on CI streams.
static int nbr_block_mode(const SliceCtx& ctx, const MbState* m, int blk) {
  if (!m) return -1;
  if (ctx.pps->constrained_intra_pred && !mb_is_intra(m->mb_class)) return -1;
  if (m->i4_modes[blk] < 0) return 2;  // inter or I16 neighbor -> DC
  return m->i4_modes[blk];
}

void SliceCtx::intra_4x4_ab(int blk, int* a, int* b) const {
  int bx = blk & 3, by = blk >> 2;
  if (bx > 0) {
    *a = cur.i4_modes[blk - 1] < 0 ? 2 : cur.i4_modes[blk - 1];
  } else {
    *a = nbr_block_mode(*this, nbr(addr_left()), by * 4 + 3);
  }
  if (by > 0) {
    *b = cur.i4_modes[blk - 4] < 0 ? 2 : cur.i4_modes[blk - 4];
  } else {
    *b = nbr_block_mode(*this, nbr(addr_above()), 12 + bx);
  }
}

int SliceCtx::pred_intra_4x4_mode(int blk) const {
  int modeA, modeB;
  intra_4x4_ab(blk, &modeA, &modeB);
  if (modeA < 0 || modeB < 0) return 2;  // dcPredModePredictedFlag
  return std::min(modeA, modeB);
}

void SliceCtx::intra_8x8_ab(int blk8, int* a, int* b) const {
  // 8x8 blocks map onto the 4x4 grid: blk8 (2x2 raster) covers 4x4 blocks
  // with top-left raster index:
  static const int kTopLeft[4] = {0, 2, 8, 10};
  int tl = kTopLeft[blk8];
  int bx = blk8 & 1, by = blk8 >> 1;
  if (bx > 0) {
    *a = cur.i4_modes[tl - 1] < 0 ? 2 : cur.i4_modes[tl - 1];
  } else {
    *a = nbr_block_mode(*this, nbr(addr_left()), (by * 2) * 4 + 3);
  }
  if (by > 0) {
    *b = cur.i4_modes[tl - 4] < 0 ? 2 : cur.i4_modes[tl - 4];
  } else {
    *b = nbr_block_mode(*this, nbr(addr_above()), 12 + bx * 2);
  }
}

int SliceCtx::pred_intra_8x8_mode(int blk8) const {
  int modeA, modeB;
  intra_8x8_ab(blk8, &modeA, &modeB);
  if (modeA < 0 || modeB < 0) return 2;
  return std::min(modeA, modeB);
}

void SliceCtx::commit(const MbRecord& rec) {
  cur.decoded = true;
  cur.slice_id = slice_id;
  cur.mb_class = rec.mb_class;
  cur.transform_8x8 = rec.transform_8x8;
  cur.cbp_luma = rec.cbp_luma;
  cur.cbp_chroma = rec.cbp_chroma;
  cur.qp = i8(cur_qp);
  cur.dqp = rec.dqp;
  cur.intra16 = (rec.mb_class == MB_I16x16);
  cur.intra_chroma_mode = rec.chroma_mode;
  cur.skip_flag = (rec.mb_class == MB_PSKIP);
  // cur.nnz is filled in-place by the parse/write paths (CAVLC: total_coeff
  // per sub-4x4; CABAC: engine cache semantics) — not copied from rec.nnz,
  // whose layout is the model's.
  if (rec.mb_class == MB_PCM) {
    for (int i = 0; i < 24; ++i) cur.nnz[i] = 16;
    for (int i = 0; i < 16; ++i) cur.i4_modes[i] = -1;
  }
  if (rec.mb_class == MB_I4x4) {
    for (int d = 0; d < 16; ++d)
      cur.i4_modes[kBlk4x4DecodeOrder[d]] = i8(rec.i4_modes[d]);
  } else if (rec.mb_class == MB_I8x8) {
    static const int kTopLeft[4] = {0, 2, 8, 10};
    for (int b = 0; b < 4; ++b) {
      int tl = kTopLeft[b];
      i8 m = i8(rec.i4_modes[b]);
      cur.i4_modes[tl] = cur.i4_modes[tl + 1] = m;
      cur.i4_modes[tl + 4] = cur.i4_modes[tl + 5] = m;
    }
  }
  // mvd / ref cells (CABAC contexts; partition-replicated, raster-in-MB)
  expand_inter_cells(rec, cur.ref_cell, cur.mvd);
  memcpy(cur.ref_idx, rec.ref_idx, sizeof(cur.ref_idx));
  memcpy(cur.sub_types, rec.sub_types, sizeof(cur.sub_types));
  pic->at(mb_addr) = cur;
}

void expand_inter_cells(const MbRecord& rec, i8 ref_cell[16], i16 mvd_cell[16][2]) {
  auto fill = [&](int bx0, int by0, int w, int h, i8 ref, const i16* mvd) {
    for (int y = by0; y < by0 + h; ++y) {
      for (int x = bx0; x < bx0 + w; ++x) {
        int c = y * 4 + x;
        ref_cell[c] = ref;
        mvd_cell[c][0] = mvd[0];
        mvd_cell[c][1] = mvd[1];
      }
    }
  };
  static const i16 kZeroMv[2] = {0, 0};
  switch (rec.mb_class) {
    case MB_PSKIP:
      fill(0, 0, 4, 4, 0, kZeroMv);
      break;
    case MB_P16x16:
      fill(0, 0, 4, 4, rec.ref_idx[0], rec.mvd[0]);
      break;
    case MB_P16x8:
      fill(0, 0, 4, 2, rec.ref_idx[0], rec.mvd[0]);
      fill(0, 2, 4, 2, rec.ref_idx[1], rec.mvd[1]);
      break;
    case MB_P8x16:
      fill(0, 0, 2, 4, rec.ref_idx[0], rec.mvd[0]);
      fill(2, 0, 2, 4, rec.ref_idx[1], rec.mvd[1]);
      break;
    case MB_P8x8:
    case MB_P8x8REF0:
      for (int i = 0; i < 4; ++i) {
        int bx0 = (i & 1) * 2, by0 = (i >> 1) * 2;
        i8 ref = rec.mb_class == MB_P8x8REF0 ? i8(0) : rec.ref_idx[i];
        switch (rec.sub_types[i]) {
          case SUB_8x8:
            fill(bx0, by0, 2, 2, ref, rec.mvd[4 * i]);
            break;
          case SUB_8x4:
            fill(bx0, by0, 2, 1, ref, rec.mvd[4 * i]);
            fill(bx0, by0 + 1, 2, 1, ref, rec.mvd[4 * i + 1]);
            break;
          case SUB_4x8:
            fill(bx0, by0, 1, 2, ref, rec.mvd[4 * i]);
            fill(bx0 + 1, by0, 1, 2, ref, rec.mvd[4 * i + 1]);
            break;
          default:  // SUB_4x4
            for (int j = 0; j < 4; ++j)
              fill(bx0 + (j & 1), by0 + (j >> 1), 1, 1, ref, rec.mvd[4 * i + j]);
            break;
        }
      }
      break;
    default:  // intra / PCM: cells stay -1 / 0
      break;
  }
}

int SliceCtx::commit_skips(int addr, int count) {
  for (int i = 0; i < count; ++i) {
    begin_mb(addr);
    MbRecord skip;
    skip.mb_class = MB_PSKIP;
    commit(skip);
    addr = next_mb_address(*pic, addr);
  }
  mb_addr = addr;
  return addr;
}

void derive_nnz(MbRecord& rec) {
  memset(rec.nnz, 0, sizeof(rec.nnz));
  if (rec.transform_8x8) {
    // CAVLC 8x8: sub-4x4 b of 8x8 block i holds scan positions 4k+b; its
    // total_coeff feeds the nnz cache at the corresponding 4x4 position.
    for (int i8 = 0; i8 < 4; ++i8) {
      for (int b = 0; b < 4; ++b) {
        int cnt = 0;
        for (int k = 0; k < 16; ++k)
          if (rec.luma_ac8[i8][4 * k + b]) ++cnt;
        int d = i8 * 4 + b;  // decode-order 4x4 index
        rec.nnz[kBlk4x4DecodeOrder[d]] = u8(cnt);
      }
    }
  } else {
    for (int d = 0; d < 16; ++d) {
      int r = kBlk4x4DecodeOrder[d];
      int cnt = 0;
      int start = (rec.mb_class == MB_I16x16) ? 1 : 0;
      for (int k = start; k < 16; ++k)
        if (rec.luma_ac[r][k]) ++cnt;
      rec.nnz[r] = u8(cnt);
    }
  }
  for (int c = 0; c < 2; ++c) {
    for (int b = 0; b < 4; ++b) {
      int cnt = 0;
      for (int k = 1; k < 16; ++k)
        if (rec.chroma_ac[c * 4 + b][k]) ++cnt;
      rec.nnz[16 + c * 4 + b] = u8(cnt);
    }
  }
}

}  // namespace h264pip
