// Shared slice/macroblock context state used identically by the parse
// (compress) and write (recode) paths — the explicit "state transition
// function" that replaces the reference's trick of re-feeding synthesized
// CAVLC bits through its decoder (decode_slice.cpp:2891-2936).
//
// Covers: MB availability (same-slice rule, ISO 14496-10 6.4.8-6.4.11),
// CAVLC nC derivation (9.2.1), intra 4x4/8x8 prediction-mode prediction
// (8.3.1.1), and the per-MB state commit.
#pragma once

#include "h264_syntax.h"

namespace h264pip {

struct SliceCtx {
  const Sps* sps = nullptr;
  const Pps* pps = nullptr;
  const SliceHeader* sh = nullptr;
  PicState* pic = nullptr;
  u8 slice_id = 0;
  int cur_qp = 26;         // running luma QP (QP_prev chain)
  int mb_addr = 0;         // current MB address
  i8 last_dqp = 0;         // previous MB's mb_qp_delta (CABAC ctx)
  MbState cur;             // working state of the MB being parsed/written
  // bench billing ledger (original H.264 bits per BillTag); set by the
  // engine during parse, null during write/recode. Reference: BILL_BITS
  // accumulation inside the bitstream readers (dec_golomb.h:71-82).
  double* bench = nullptr;

  inline void bill(int tag, double bits) {
    if (bench) bench[tag] += bits;
  }

  int mb_width() const { return pic->mb_width; }
  int mb_x() const { return mb_addr % pic->mb_width; }
  int mb_y() const { return mb_addr / pic->mb_width; }

  void begin_slice(const Sps* s, const Pps* p, const SliceHeader* h,
                   PicState* pc) {
    sps = s;
    pps = p;
    sh = h;
    pic = pc;
    slice_id = u8(pc->next_slice_id++);
    cur_qp = h->slice_qp;
    mb_addr = h->first_mb_in_slice;
    last_dqp = 0;
  }

  void begin_mb(int addr) {
    mb_addr = addr;
    cur = MbState();
    cur.slice_id = slice_id;
    memset(cur.i4_modes, -1, sizeof(cur.i4_modes));
  }

  // --- neighbor addressing (frame coding, no MBAFF) ---
  int addr_left() const { return mb_x() > 0 ? mb_addr - 1 : -1; }
  int addr_above() const { return mb_y() > 0 ? mb_addr - mb_width() : -1; }
  int addr_above_left() const {
    return (mb_x() > 0 && mb_y() > 0) ? mb_addr - mb_width() - 1 : -1;
  }
  int addr_above_right() const {
    return (mb_x() + 1 < mb_width() && mb_y() > 0) ? mb_addr - mb_width() + 1
                                                   : -1;
  }

  bool mb_avail(int addr) const {
    if (addr < 0) return false;
    const MbState& m = pic->at(addr);
    return m.decoded && m.slice_id == slice_id;
  }
  const MbState* nbr(int addr) const {
    return mb_avail(addr) ? &pic->at(addr) : nullptr;
  }

  // --- CAVLC nC (9.2.1): blk is the raster index (0..15) of a luma 4x4
  // block within the MB; uses cur.nnz for in-MB neighbors. ---
  int nC_luma(int blk_raster) const;
  // chroma: component c (0=u,1=v), blk 0..3 raster in the 2x2 grid
  int nC_chroma(int c, int blk_raster) const;

  // --- intra prediction mode prediction (8.3.1.1 / 8.3.2.1) ---
  // blk: raster 4x4 index. Returns predicted mode (DC=2 fallbacks applied).
  int pred_intra_4x4_mode(int blk_raster) const;
  // neighbor modes (A=left, B=above) feeding the 8.3.1.1 predictor;
  // -1 when the covering MB is unavailable
  void intra_4x4_ab(int blk_raster, int* a, int* b) const;
  void intra_8x8_ab(int blk8, int* a, int* b) const;
  // 8x8: blk8 in 0..3 (2x2 raster)
  int pred_intra_8x8_mode(int blk8) const;
  // neighbor availability of the current MB's A/B/C/D for intra etc.
  bool left_avail() const { return mb_avail(addr_left()); }
  bool above_avail() const { return mb_avail(addr_above()); }

  // --- QP chain ---
  void apply_dqp(i8 dqp) {
    cur_qp = (cur_qp + dqp + 52) % 52;
    last_dqp = dqp;
  }

  // Commit the working MB state to the picture and record skip/non-skip.
  void commit(const MbRecord& rec);
  // Commit a run of skipped MBs starting at `addr` walking the slice-group
  // scan; returns the next address after the run.
  int commit_skips(int addr, int count);
};

// Derive per-block total_coeff counts (rec.nnz) from coefficient arrays —
// used by the writer before re-encoding (parse fills nnz directly).
void derive_nnz(MbRecord& rec);

}  // namespace h264pip
