#include "decsupport.h"

#include "bitio.h"
#include "cabac_mb.h"
#include "cavlc.h"
#include "tables.h"

#include <algorithm>

namespace h264pip {

// ---------------------------------------------------------------------------
// DPB entry
// ---------------------------------------------------------------------------
struct DpbPic {
  int frame_num = 0;
  int output_idx = 0;  // index in decode-output order (what JAX sees)
  bool long_term = false;
  int long_term_idx = 0;
  int frame_num_wrap = 0;
};

// ---------------------------------------------------------------------------
// MV prediction helpers (8.4.1.3). Cell-based over the current picture
// state: each 4x4 cell has (mv, ref) with ref = refIdx within the current
// slice's L0 list; -1 for intra/unavailable.
// ---------------------------------------------------------------------------
struct MvCtx {
  SliceCtx* sc;
  // current MB working cells (being filled partition by partition)
  i16 (*cur_mv)[2];
  i8* cur_ref;
  const bool* cur_filled;  // in-MB cells later in decode order are
                           // NOT available neighbors (spec 6.4.11.7)

  struct Nbr {
    bool avail = false;
    i16 mv[2] = {0, 0};
    i8 ref = -1;
  };

  // cell coordinates relative to current MB; may fall outside (neighbors)
  Nbr cell(int bx, int by) const {
    Nbr r;
    if (bx >= 0 && bx < 4 && by >= 0 && by < 4) {
      int c = by * 4 + bx;
      if (!cur_filled[c]) return r;  // not yet decoded -> unavailable
      r.avail = true;
      r.ref = cur_ref[c];
      r.mv[0] = cur_mv[c][0];
      r.mv[1] = cur_mv[c][1];
      return r;
    }
    int addr;
    int nbx = bx, nby = by;
    if (bx < 0 && by < 0) {
      addr = sc->addr_above_left();
      nbx = 3;
      nby = 3;
    } else if (bx >= 4 && by < 0) {
      addr = sc->addr_above_right();
      nbx = bx - 4;
      nby = 3;
    } else if (by < 0) {
      addr = sc->addr_above();
      nby = 3;
    } else if (bx < 0) {
      addr = sc->addr_left();
      nbx = 3;
    } else {
      return r;  // below/right: unavailable
    }
    if (!sc->mb_avail(addr)) return r;
    const MbState& m = sc->pic->at(addr);
    int c = nby * 4 + nbx;
    r.avail = true;
    r.ref = m.ref_cell[c];
    r.mv[0] = m.mv[c][0];
    r.mv[1] = m.mv[c][1];
    return r;
  }

  static i16 median3(i16 a, i16 b, i16 c) {
    return std::max(std::min(a, b), std::min(std::max(a, b), c));
  }

  // Standard luma MV predictor for a partition at (bx,by) of size (w,h)
  // cells with reference index `ref`. part_kind: 0 normal, 1 top-16x8,
  // 2 bottom-16x8, 3 left-8x16, 4 right-8x16.
  void predict(int bx, int by, int w, int h, int ref, int part_kind,
               i16 out[2]) const {
    Nbr A = cell(bx - 1, by);
    Nbr B = cell(bx, by - 1);
    Nbr C = cell(bx + w, by - 1);
    if (!C.avail) C = cell(bx - 1, by - 1);  // fallback to D
    // treat intra/unavailable as mv 0 ref -1 (already encoded that way)
    if (part_kind == 1 && B.ref == ref) {
      out[0] = B.mv[0];
      out[1] = B.mv[1];
      return;
    }
    if (part_kind == 2 && A.ref == ref) {
      out[0] = A.mv[0];
      out[1] = A.mv[1];
      return;
    }
    if (part_kind == 3 && A.ref == ref) {
      out[0] = A.mv[0];
      out[1] = A.mv[1];
      return;
    }
    if (part_kind == 4 && C.ref == ref) {
      out[0] = C.mv[0];
      out[1] = C.mv[1];
      return;
    }
    // B, C (and D) unavailable while A available -> mvA
    Nbr Braw = cell(bx, by - 1);
    Nbr Craw = cell(bx + w, by - 1);
    Nbr Draw = cell(bx - 1, by - 1);
    if (!Braw.avail && !Craw.avail && !Draw.avail && A.avail) {
      out[0] = A.mv[0];
      out[1] = A.mv[1];
      return;
    }
    int match = (A.ref == ref) + (B.ref == ref) + (C.ref == ref);
    if (match == 1) {
      const Nbr& only = (A.ref == ref) ? A : (B.ref == ref ? B : C);
      out[0] = only.mv[0];
      out[1] = only.mv[1];
      return;
    }
    out[0] = median3(A.mv[0], B.mv[0], C.mv[0]);
    out[1] = median3(A.mv[1], B.mv[1], C.mv[1]);
  }

  // P_Skip motion (8.4.1.1)
  void skip_mv(i16 out[2]) const {
    Nbr A = cell(-1, 0);
    Nbr B = cell(0, -1);
    if (!A.avail || !B.avail ||
        (A.ref == 0 && A.mv[0] == 0 && A.mv[1] == 0) ||
        (B.ref == 0 && B.mv[0] == 0 && B.mv[1] == 0)) {
      out[0] = out[1] = 0;
      return;
    }
    predict(0, 0, 4, 4, 0, 0, out);
  }
};

// Fill absolute MVs + ref cells for a parsed MB record.
static void derive_mvs(SliceCtx& sc, MbRecord& rec) {
  i16 mv_cells[16][2] = {};
  i8 ref_cells[16];
  bool filled[16] = {};
  memset(ref_cells, -1, sizeof(ref_cells));
  MvCtx mc{&sc, mv_cells, ref_cells, filled};

  auto fill = [&](int bx, int by, int w, int h, i8 ref, const i16 m[2]) {
    for (int y = by; y < by + h; ++y)
      for (int x = bx; x < bx + w; ++x) {
        int c = y * 4 + x;
        ref_cells[c] = ref;
        mv_cells[c][0] = m[0];
        mv_cells[c][1] = m[1];
        filled[c] = true;
      }
  };

  switch (rec.mb_class) {
    case MB_PSKIP: {
      i16 m[2];
      // ref 0 must be set before predict? skip uses neighbors only
      mc.skip_mv(m);
      fill(0, 0, 4, 4, 0, m);
      break;
    }
    case MB_P16x16: {
      i16 p[2], m[2];
      mc.predict(0, 0, 4, 4, rec.ref_idx[0], 0, p);
      m[0] = i16(p[0] + rec.mvd[0][0]);
      m[1] = i16(p[1] + rec.mvd[0][1]);
      fill(0, 0, 4, 4, rec.ref_idx[0], m);
      break;
    }
    case MB_P16x8: {
      for (int i = 0; i < 2; ++i) {
        i16 p[2], m[2];
        mc.predict(0, i * 2, 4, 2, rec.ref_idx[i], 1 + i, p);
        m[0] = i16(p[0] + rec.mvd[i][0]);
        m[1] = i16(p[1] + rec.mvd[i][1]);
        fill(0, i * 2, 4, 2, rec.ref_idx[i], m);
      }
      break;
    }
    case MB_P8x16: {
      for (int i = 0; i < 2; ++i) {
        i16 p[2], m[2];
        mc.predict(i * 2, 0, 2, 4, rec.ref_idx[i], 3 + i, p);
        m[0] = i16(p[0] + rec.mvd[i][0]);
        m[1] = i16(p[1] + rec.mvd[i][1]);
        fill(i * 2, 0, 2, 4, rec.ref_idx[i], m);
      }
      break;
    }
    case MB_P8x8:
    case MB_P8x8REF0: {
      for (int i = 0; i < 4; ++i) {
        int bx0 = (i & 1) * 2, by0 = (i >> 1) * 2;
        i8 ref = rec.mb_class == MB_P8x8REF0 ? i8(0) : rec.ref_idx[i];
        auto sub = [&](int sx, int sy, int w, int h, int slot) {
          i16 p[2], m[2];
          mc.predict(bx0 + sx, by0 + sy, w, h, ref, 0, p);
          m[0] = i16(p[0] + rec.mvd[slot][0]);
          m[1] = i16(p[1] + rec.mvd[slot][1]);
          fill(bx0 + sx, by0 + sy, w, h, ref, m);
        };
        switch (rec.sub_types[i]) {
          case SUB_8x8: sub(0, 0, 2, 2, 4 * i); break;
          case SUB_8x4:
            sub(0, 0, 2, 1, 4 * i);
            sub(0, 1, 2, 1, 4 * i + 1);
            break;
          case SUB_4x8:
            sub(0, 0, 1, 2, 4 * i);
            sub(1, 0, 1, 2, 4 * i + 1);
            break;
          default:
            for (int j = 0; j < 4; ++j)
              sub(j & 1, j >> 1, 1, 1, 4 * i + j);
            break;
        }
      }
      break;
    }
    default:
      break;  // intra: cells stay -1
  }
  memcpy(rec.mv, mv_cells, sizeof(mv_cells));
  // also push into the working MbState so the engine commit stores them
  memcpy(sc.cur.mv, mv_cells, sizeof(mv_cells));
}

void predict_mv_p16x16(SliceCtx& sc, i8 ref, i16 out[2]) {
  i16 mv_cells[16][2] = {};
  i8 ref_cells[16];
  bool filled[16] = {};
  memset(ref_cells, -1, sizeof(ref_cells));
  MvCtx mc{&sc, mv_cells, ref_cells, filled};
  mc.predict(0, 0, 4, 4, ref, 0, out);
}

void predict_mv_skip(SliceCtx& sc, i16 out[2]) {
  i16 mv_cells[16][2] = {};
  i8 ref_cells[16];
  bool filled[16] = {};
  memset(ref_cells, -1, sizeof(ref_cells));
  MvCtx mc{&sc, mv_cells, ref_cells, filled};
  mc.skip_mv(out);
}

void derive_mvs_record(SliceCtx& sc, MbRecord& rec) { derive_mvs(sc, rec); }

// Encoder support: given absolute MVs for the four 8x8 partitions of a
// P8x8 MB (sub_types all SUB_8x8, ref 0), compute the per-partition MVDs
// against the sequential 8.4.1.3 predictors (each partition's predictor
// sees the previously filled partitions of this MB).
void compute_p8x8_mvds(SliceCtx& sc, const i16 mv8[4][2], MbRecord& rec) {
  i16 mv_cells[16][2] = {};
  i8 ref_cells[16];
  bool filled[16] = {};
  memset(ref_cells, -1, sizeof(ref_cells));
  MvCtx mc{&sc, mv_cells, ref_cells, filled};
  for (int i = 0; i < 4; ++i) {
    int bx0 = (i & 1) * 2, by0 = (i >> 1) * 2;
    i16 p[2];
    mc.predict(bx0, by0, 2, 2, rec.ref_idx[i], 0, p);
    rec.mvd[4 * i][0] = i16(mv8[i][0] - p[0]);
    rec.mvd[4 * i][1] = i16(mv8[i][1] - p[1]);
    for (int y = by0; y < by0 + 2; ++y)
      for (int x = bx0; x < bx0 + 2; ++x) {
        int c = y * 4 + x;
        ref_cells[c] = rec.ref_idx[i];
        mv_cells[c][0] = mv8[i][0];
        mv_cells[c][1] = mv8[i][1];
        filled[c] = true;
      }
  }
}

// Encoder support: absolute MVs for the two partitions of a P16x8 /
// P8x16 MB -> MVDs against the sequential directional predictors
// (8.4.1.3.1: 16x8 prefers B/A, 8x16 prefers A/C).
void compute_p16x8_mvds(SliceCtx& sc, const i16 mv2[2][2], MbRecord& rec) {
  i16 mv_cells[16][2] = {};
  i8 ref_cells[16];
  bool filled[16] = {};
  memset(ref_cells, -1, sizeof(ref_cells));
  MvCtx mc{&sc, mv_cells, ref_cells, filled};
  for (int i = 0; i < 2; ++i) {
    i16 p[2];
    mc.predict(0, i * 2, 4, 2, rec.ref_idx[i], 1 + i, p);
    rec.mvd[i][0] = i16(mv2[i][0] - p[0]);
    rec.mvd[i][1] = i16(mv2[i][1] - p[1]);
    for (int y = i * 2; y < i * 2 + 2; ++y)
      for (int x = 0; x < 4; ++x) {
        int c = y * 4 + x;
        ref_cells[c] = rec.ref_idx[i];
        mv_cells[c][0] = mv2[i][0];
        mv_cells[c][1] = mv2[i][1];
        filled[c] = true;
      }
  }
}

void compute_p8x16_mvds(SliceCtx& sc, const i16 mv2[2][2], MbRecord& rec) {
  i16 mv_cells[16][2] = {};
  i8 ref_cells[16];
  bool filled[16] = {};
  memset(ref_cells, -1, sizeof(ref_cells));
  MvCtx mc{&sc, mv_cells, ref_cells, filled};
  for (int i = 0; i < 2; ++i) {
    i16 p[2];
    mc.predict(i * 2, 0, 2, 4, rec.ref_idx[i], 3 + i, p);
    rec.mvd[i][0] = i16(mv2[i][0] - p[0]);
    rec.mvd[i][1] = i16(mv2[i][1] - p[1]);
    for (int y = 0; y < 4; ++y)
      for (int x = i * 2; x < i * 2 + 2; ++x) {
        int c = y * 4 + x;
        ref_cells[c] = rec.ref_idx[i];
        mv_cells[c][0] = mv2[i][0];
        mv_cells[c][1] = mv2[i][1];
        filled[c] = true;
      }
  }
}

// ---------------------------------------------------------------------------
// SymbolDecoder implementation
// ---------------------------------------------------------------------------
struct NalSpanLite {
  size_t payload_start, payload_end;
};

// local annexb scan (payload spans only)
static std::vector<NalSpanLite> scan_units(const u8* d, size_t n) {
  std::vector<NalSpanLite> out;
  size_t i = 0;
  std::vector<size_t> sc;
  while (i + 2 < n) {
    if (d[i] == 0 && d[i + 1] == 0 && d[i + 2] == 1) {
      sc.push_back(i);
      i += 3;
    } else if (d[i + 2] > 1) {
      i += 3;
    } else {
      ++i;
    }
  }
  for (size_t k = 0; k < sc.size(); ++k) {
    NalSpanLite s;
    s.payload_start = sc[k] + 3;
    size_t e = (k + 1 < sc.size()) ? sc[k + 1] : n;
    while (e > s.payload_start && d[e - 1] == 0 && (k + 1 < sc.size())) --e;
    s.payload_end = e;
    out.push_back(s);
  }
  return out;
}

struct SymbolDecoderImpl {
  std::vector<u8> data;
  std::vector<NalSpanLite> nals;
  size_t nal_idx = 0;
  std::map<int, Sps> sps_map;
  std::map<int, Pps> pps_map;
  SliceHeader prev_sh;
  bool have_prev = false;
  PicState pic;
  int output_idx = 0;
  int prev_frame_num = 0;
  std::vector<DpbPic> dpb;
  int max_long_term_idx = -1;
  // pending slice (first slice of the next picture, already parsed)
  bool have_pending = false;
  std::vector<u8> pending_rbsp;
  SliceHeader pending_sh;
};

SymbolDecoder::SymbolDecoder(const u8* data, size_t size) {
  impl_ = std::make_shared<SymbolDecoderImpl>();
  impl_->data.assign(data, data + size);
  impl_->nals = scan_units(impl_->data.data(), impl_->data.size());
}

static bool is_new_pic(const SliceHeader* prev, const SliceHeader& cur) {
  if (!prev) return true;
  if (prev->frame_num != cur.frame_num) return true;
  if (prev->pps_id != cur.pps_id) return true;
  if ((prev->nal_ref_idc == 0) != (cur.nal_ref_idc == 0)) return true;
  if (prev->is_idr != cur.is_idr) return true;
  if (cur.is_idr && prev->idr_pic_id != cur.idr_pic_id) return true;
  if (prev->poc_lsb != cur.poc_lsb) return true;
  if (prev->delta_poc[0] != cur.delta_poc[0]) return true;
  if (cur.first_mb_in_slice <= prev->first_mb_in_slice) return true;
  return false;
}

// Build L0 reference list for a P slice (8.2.4.2.3 + 8.2.4.3). Returns
// output_idx per list position.
static std::vector<int> build_ref_list(SymbolDecoderImpl& im, const Sps& sps,
                                       const SliceHeader& sh) {
  int max_fn = 1 << sps.log2_max_frame_num;
  // The reference initializes L0 from its short list in INSERTION order
  // (newest-added first, WelsInitRefList manage_dec_ref.cpp:161 — NOT
  // re-sorted by PicNum), then long-terms by ascending idx. Our dpb
  // vector appends newest, so shorts iterate reversed.
  std::vector<DpbPic> st, lt;
  for (auto it = im.dpb.rbegin(); it != im.dpb.rend(); ++it) {
    if (!it->long_term) st.push_back(*it);
  }
  for (auto& p : im.dpb) {
    if (p.long_term) lt.push_back(p);
  }
  std::sort(lt.begin(), lt.end(), [](const DpbPic& a, const DpbPic& b) {
    return a.long_term_idx < b.long_term_idx;
  });
  std::vector<DpbPic> list = st;
  list.insert(list.end(), lt.begin(), lt.end());

  // ref_pic_list_modification. NB: we mirror the reference decoder's
  // behavior (manage_dec_ref.cpp WelsReorderRefList), which deviates from
  // spec 8.2.4.3.1 in three observable ways that matter for parity:
  //  - picNum prediction is frame_num arithmetic masked into [0, MaxFrameNum)
  //    and compared against frame_num directly (no FrameNumWrap),
  //  - the matched pic is ROTATED to the front of the unprocessed region
  //    (list never gains or loses entries, so no duplicate head like the
  //    spec's shift+prune produces on re-selecting ops),
  //  - a miss ABORTS the remaining ops, keeping the partially reordered
  //    list (streams like tibby*.264 carry (0,0)(0,15)(0,0) ops whose
  //    second op misses; the reference decodes on with [n-1, n-2, ...]).
  if (!sh.rplr_l0.empty()) {
    int pred = sh.frame_num;
    int ridx = 0;
    int ref_count = int(list.size());
    for (auto& op : sh.rplr_l0) {
      int i = -1;
      if (op.first == 0 || op.first == 1) {
        int abs_diff = int(op.second) + 1;
        pred = op.first == 0 ? pred - abs_diff : pred + abs_diff;
        pred &= max_fn - 1;
        for (i = ref_count - 1; i >= ridx; --i)
          if (!list[i].long_term && list[i].frame_num == pred) break;
      } else if (op.first == 2) {
        for (i = ref_count - 1; i >= ridx; --i)
          if (list[i].long_term && list[i].long_term_idx == (int)op.second)
            break;
      }
      if (i < ridx) break;  // reference aborts the reorder here
      DpbPic p = list[i];
      list.erase(list.begin() + i);
      list.insert(list.begin() + ridx, p);
      ++ridx;
    }
  }
  std::vector<int> out;
  for (auto& p : list) out.push_back(p.output_idx);
  // ref_idx beyond the populated list hits the reference's NULL-entry
  // fallback (rec_mb.cpp GetRefPic): it substitutes list[0].
  out.resize(std::max<size_t>(sh.num_ref_idx_l0_active, 1),
             out.empty() ? -1 : out[0]);
  if (getenv("PIP_DBG_REF")) {
    fprintf(stderr, "DBGLIST fn=%d nact=%d rplr=[", sh.frame_num,
            sh.num_ref_idx_l0_active);
    for (auto& op : sh.rplr_l0) fprintf(stderr, "(%d,%u)", op.first, op.second);
    fprintf(stderr, "] dpb=[");
    for (auto& p : im.dpb)
      fprintf(stderr, "(fn=%d out=%d lt=%d)", p.frame_num, p.output_idx,
              int(p.long_term));
    fprintf(stderr, "] list=[");
    for (int v : out) fprintf(stderr, "%d,", v);
    fprintf(stderr, "]\n");
  }
  return out;
}

// Apply reference marking after decoding a picture (8.2.5).
static void mark_refs(SymbolDecoderImpl& im, const Sps& sps, const SliceHeader& sh,
                      int output_idx) {
  int max_fn = 1 << sps.log2_max_frame_num;
  if (sh.is_idr) {
    im.dpb.clear();
    im.max_long_term_idx = -1;
    DpbPic p;
    p.frame_num = sh.frame_num;
    p.output_idx = output_idx;
    if (sh.long_term_reference_flag) {
      p.long_term = true;
      p.long_term_idx = 0;
      im.max_long_term_idx = 0;
    }
    im.dpb.push_back(p);
    return;
  }
  if (sh.nal_ref_idc == 0) return;
  if (getenv("PIP_DBG_REF")) {
    fprintf(stderr, "DBGMARK fn=%d adaptive=%d maxref=%d mmco=[",
            sh.frame_num, int(sh.adaptive_ref_pic_marking),
            sps.max_num_ref_frames);
    for (auto& m : sh.mmco) fprintf(stderr, "(%d,%u,%u)", m.op, m.v1, m.v2);
    fprintf(stderr, "]\n");
  }
  // Mirrors the reference's WelsMarkAsRef / MMCOProcess / SlidingWindow /
  // RemainOneBufferInDpbForEC (manage_dec_ref.cpp:255-448) exactly —
  // including its EC overflow-eviction behavior (h264dec always runs with
  // error concealment on, so an overflowing DPB evicts another oldest
  // short BEFORE the current pic is added; getting this wrong shifted
  // long-term refs out of L0 on the MR2 conformance streams).
  int N = sps.max_num_ref_frames;  // iNumRefFrames
  auto count_total = [&]() { return int(im.dpb.size()); };
  auto num_short = [&]() {
    int c = 0;
    for (auto& p : im.dpb)
      if (!p.long_term) ++c;
    return c;
  };
  // SlidingWindow: evict the oldest-added short-term when total >= N.
  // Returns false on the reference's "no short ref" error.
  auto sliding_window = [&]() -> bool {
    if (count_total() < N) return true;
    if (num_short() == 0) return false;
    for (size_t i = 0; i < im.dpb.size(); ++i) {
      if (!im.dpb[i].long_term) {  // oldest short = first appended
        im.dpb.erase(im.dpb.begin() + i);
        return true;
      }
    }
    return false;
  };
  // RemainOneBufferInDpbForEC: make room when total >= N (EC path).
  auto remain_one = [&]() {
    if (count_total() < N) return;
    if (num_short() > 0) {
      sliding_window();
    } else {
      // all long-term: drop by ascending idx until a slot frees
      int idx = 0;
      while (count_total() >= N && idx <= im.max_long_term_idx) {
        for (size_t i = 0; i < im.dpb.size(); ++i) {
          if (im.dpb[i].long_term && im.dpb[i].long_term_idx == idx) {
            im.dpb.erase(im.dpb.begin() + i);
            break;
          }
        }
        ++idx;
      }
    }
  };
  auto del_long_idx = [&](int idx) {
    for (size_t i = 0; i < im.dpb.size(); ++i) {
      if (im.dpb[i].long_term && im.dpb[i].long_term_idx == idx) {
        im.dpb.erase(im.dpb.begin() + i);
        return;
      }
    }
  };
  bool cur_long = false;
  bool mmco5 = false;
  if (sh.adaptive_ref_pic_marking) {
    bool err = false;
    for (auto& m : sh.mmco) {
      if (err) break;
      switch (m.op) {
        case 1: {  // short -> unused; PicNum masked into [0, MaxFrameNum)
          int pic_num = (sh.frame_num - (int(m.v1) + 1)) & (max_fn - 1);
          // reference DelShortFromList scans newest-first
          for (int i = int(im.dpb.size()) - 1; i >= 0; --i) {
            if (!im.dpb[i].long_term && im.dpb[i].frame_num == pic_num) {
              im.dpb.erase(im.dpb.begin() + i);
              break;
            }
          }
          break;
        }
        case 2:  // long -> unused (LongTermPicNum == idx for frame coding)
          del_long_idx(int(m.v1));
          break;
        case 3: {  // short -> long
          if (int(m.v2) > im.max_long_term_idx) {
            err = true;  // reference aborts remaining ops (EXCEED_MAX)
            break;
          }
          int pic_num = (sh.frame_num - (int(m.v1) + 1)) & (max_fn - 1);
          int found = -1;
          for (int i = int(im.dpb.size()) - 1; i >= 0; --i) {
            if (!im.dpb[i].long_term && im.dpb[i].frame_num == pic_num) {
              found = i;
              break;
            }
          }
          if (found < 0) break;  // reference: warning only
          del_long_idx(int(m.v2));
          // found index may have shifted after del_long_idx; re-find
          for (int i = int(im.dpb.size()) - 1; i >= 0; --i) {
            if (!im.dpb[i].long_term && im.dpb[i].frame_num == pic_num) {
              im.dpb[i].long_term = true;
              im.dpb[i].long_term_idx = int(m.v2);
              break;
            }
          }
          break;
        }
        case 4:
          im.max_long_term_idx = int(m.v1) - 1;
          for (size_t i = 0; i < im.dpb.size();) {
            if (im.dpb[i].long_term &&
                im.dpb[i].long_term_idx > im.max_long_term_idx)
              im.dpb.erase(im.dpb.begin() + i);
            else
              ++i;
          }
          break;
        case 5:
          im.dpb.clear();
          im.max_long_term_idx = -1;
          mmco5 = true;  // current pic's frame_num becomes 0
          break;
        case 6:
          if (int(m.v2) > im.max_long_term_idx) {
            err = true;
            break;
          }
          del_long_idx(int(m.v2));
          if (count_total() >= std::max(1, N)) {
            err = true;  // REF_NUM_OVERFLOW aborts; pic added as short
            break;
          }
          {
            DpbPic p;
            p.frame_num = mmco5 ? 0 : sh.frame_num;
            p.output_idx = output_idx;
            p.long_term = true;
            p.long_term_idx = int(m.v2);
            im.dpb.push_back(p);
            cur_long = true;
          }
          break;
      }
    }
    if (err) remain_one();
  } else {
    if (!sliding_window()) remain_one();
  }
  if (!cur_long) {
    if (count_total() >= std::max(1, N)) remain_one();
    DpbPic p;
    p.frame_num = mmco5 ? 0 : sh.frame_num;
    p.output_idx = output_idx;
    im.dpb.push_back(p);
  }
}

// De-zigzag helpers
static void dez4(const i16* scan, i16* raster, int start) {
  for (int i = start; i < 16; ++i) raster[kZz4[i]] = scan[i];
}
static void dez8(const i16* scan, i16* raster) {
  for (int i = 0; i < 64; ++i) raster[kZz8[i]] = scan[i];
}

bool SymbolDecoder::next_frame(FramePlanes* out) {
  SymbolDecoderImpl& im = *impl_;
  const u8* d = im.data.data();

  bool frame_open = false;
  const Sps* sps = nullptr;
  const Pps* pps = nullptr;
  SliceHeader first_sh;

  auto open_frame = [&](const Sps& s, const SliceHeader& sh) {
    int w = s.mb_width(), h = s.mb_height();
    im.pic.reset(w, h);
    out->mb_w = w;
    out->mb_h = h;
    for (int i = 0; i < 4; ++i)
      out->crop[i] = s.frame_cropping ? s.crop[i] : 0;
    size_t n = size_t(w) * h;
    out->mb_class.assign(n, MB_PSKIP);
    out->qp.assign(n, 0);
    out->cbp_luma.assign(n, 0);
    out->cbp_chroma.assign(n, 0);
    out->transform8.assign(n, 0);
    out->i16_mode.assign(n, 0);
    out->chroma_mode.assign(n, 0);
    out->i4_modes.assign(n * 16, -1);
    out->luma_ac.assign(n * 256, 0);
    out->luma_dc.assign(n * 16, 0);
    out->luma8.assign(n * 256, 0);
    out->chroma_ac.assign(n * 128, 0);
    out->chroma_dc.assign(n * 8, 0);
    out->mv.assign(n * 32, 0);
    out->ref_frame.assign(n * 16, -1);
    out->ref_idx.assign(n * 16, -1);
    out->part_tl.assign(n * 16, 0);
    memset(out->ref_list, -1, sizeof(out->ref_list));
    out->n_ref_list = 0;
    out->pcm.assign(n * 384, 0);
    out->slice_id.assign(n, 0xff);
    out->deblock_idc.assign(n, 1);
    out->decoded.assign(n, 0);
    out->lost_slices = 0;
    out->alpha_off.assign(n, 0);
    out->beta_off.assign(n, 0);
    out->wp_luma.assign(n * 48, 0);
    out->wp_cb.assign(n * 48, 0);
    out->wp_cr.assign(n * 48, 0);
    out->wp_cmask.assign(n * 64, 0);
    for (size_t k = 2; k < n * 48; k += 3) {
      out->wp_luma[k] = -1;  // denom slot: -1 = unweighted
      out->wp_cb[k] = -1;
      out->wp_cr[k] = -1;
    }
    out->is_idr = sh.is_idr;
    out->is_ref = sh.nal_ref_idc != 0;
    frame_open = true;
  };

  auto record_mb = [&](int addr, const MbRecord& rec, const SliceCtx& sc,
                       const SliceHeader& sh, const std::vector<int>& reflist) {
    size_t n = addr;
    out->mb_class[n] = rec.mb_class;
    out->qp[n] = rec.qp;
    out->cbp_luma[n] = rec.cbp_luma;
    out->cbp_chroma[n] = rec.cbp_chroma;
    out->transform8[n] = rec.transform_8x8;
    out->i16_mode[n] = rec.i16_mode;
    out->chroma_mode[n] = rec.chroma_mode;
    for (int c = 0; c < 16; ++c) out->i4_modes[n * 16 + c] = sc.cur.i4_modes[c];
    if (rec.mb_class == MB_PCM) {
      memcpy(&out->pcm[n * 384], rec.pcm, 384);
    }
    if (rec.transform_8x8 && rec.mb_class != MB_I4x4) {
      for (int b = 0; b < 4; ++b)
        dez8(rec.luma_ac8[b], &out->luma8[n * 256 + b * 64]);
    } else {
      for (int b = 0; b < 16; ++b) {
        bool i16f = rec.mb_class == MB_I16x16;
        dez4(rec.luma_ac[b], &out->luma_ac[n * 256 + b * 16], i16f ? 1 : 0);
      }
    }
    if (rec.mb_class == MB_I16x16) dez4(rec.luma_dc, &out->luma_dc[n * 16], 0);
    for (int b = 0; b < 8; ++b)
      dez4(rec.chroma_ac[b], &out->chroma_ac[n * 128 + b * 16], 1);
    // chroma DC 2x2: scan order is raster already (0,1,2,3)
    for (int c = 0; c < 2; ++c)
      for (int k = 0; k < 4; ++k)
        out->chroma_dc[n * 8 + c * 4 + k] = rec.chroma_dc[c][k];
    for (int c = 0; c < 16; ++c) {
      out->mv[(n * 16 + c) * 2 + 0] = rec.mv[c][0];
      out->mv[(n * 16 + c) * 2 + 1] = rec.mv[c][1];
      i8 r = sc.cur.ref_cell[c];
      out->ref_frame[n * 16 + c] =
          (r >= 0 && r < (int)reflist.size()) ? i16(reflist[r]) : i16(-1);
      out->ref_idx[n * 16 + c] = r;
    }
    // motion-partition top-left cells (EC MV-copy sample set)
    {
      auto tl = [&](int cell) { out->part_tl[n * 16 + cell] = 1; };
      switch (rec.mb_class) {
        case MB_PSKIP:
        case MB_P16x16: tl(0); break;
        case MB_P16x8: tl(0); tl(8); break;
        case MB_P8x16: tl(0); tl(2); break;
        case MB_P8x8:
        case MB_P8x8REF0:
          for (int i = 0; i < 4; ++i) {
            int t = (i >> 1) * 8 + (i & 1) * 2;
            switch (rec.sub_types[i]) {
              case SUB_8x8: tl(t); break;
              case SUB_8x4: tl(t); tl(t + 4); break;
              case SUB_4x8: tl(t); tl(t + 1); break;
              default: tl(t); tl(t + 1); tl(t + 4); tl(t + 5); break;
            }
          }
          break;
        default: break;
      }
    }
    // explicit weighted prediction (8.4.2.3): resolve the slice's
    // pred_weight_table per MC partition; chroma mask mirrors the
    // reference's quarter-size region (rec_mb.cpp WeightPrediction)
    if (pps->weighted_pred && sh.has_pred_weights &&
        (sh.slice_type == SLICE_P || sh.slice_type == SLICE_SP) &&
        mb_is_inter(rec.mb_class)) {
      auto wp_fill = [&](int bx, int by, int w, int h, int ridx) {
        if (ridx < 0 || ridx >= 32) ridx = 0;
        for (int y = by; y < by + h; ++y)
          for (int x = bx; x < bx + w; ++x) {
            size_t base = (n * 16 + y * 4 + x) * 3;
            out->wp_luma[base] = sh.luma_weight[ridx];
            out->wp_luma[base + 1] = sh.luma_offset[ridx];
            out->wp_luma[base + 2] = i16(sh.luma_log2_weight_denom);
            out->wp_cb[base] = sh.chroma_weight[ridx][0];
            out->wp_cb[base + 1] = sh.chroma_offset[ridx][0];
            out->wp_cb[base + 2] = i16(sh.chroma_log2_weight_denom);
            out->wp_cr[base] = sh.chroma_weight[ridx][1];
            out->wp_cr[base + 1] = sh.chroma_offset[ridx][1];
            out->wp_cr[base + 2] = i16(sh.chroma_log2_weight_denom);
          }
        // chroma mask: (w,h) chroma pixels at the partition chroma origin
        for (int cy = 2 * by; cy < 2 * by + h; ++cy)
          for (int cx = 2 * bx; cx < 2 * bx + w; ++cx)
            out->wp_cmask[n * 64 + cy * 8 + cx] = 1;
      };
      switch (rec.mb_class) {
        case MB_PSKIP:
        case MB_P16x16:
          wp_fill(0, 0, 4, 4, rec.mb_class == MB_PSKIP ? 0 : rec.ref_idx[0]);
          break;
        case MB_P16x8:
          wp_fill(0, 0, 4, 2, rec.ref_idx[0]);
          wp_fill(0, 2, 4, 2, rec.ref_idx[1]);
          break;
        case MB_P8x16:
          wp_fill(0, 0, 2, 4, rec.ref_idx[0]);
          wp_fill(2, 0, 2, 4, rec.ref_idx[1]);
          break;
        case MB_P8x8:
        case MB_P8x8REF0:
          for (int i = 0; i < 4; ++i) {
            int bx0 = (i & 1) * 2, by0 = (i >> 1) * 2;
            int ridx = rec.mb_class == MB_P8x8REF0 ? 0 : rec.ref_idx[i];
            switch (rec.sub_types[i]) {
              case SUB_8x8: wp_fill(bx0, by0, 2, 2, ridx); break;
              case SUB_8x4:
                wp_fill(bx0, by0, 2, 1, ridx);
                wp_fill(bx0, by0 + 1, 2, 1, ridx);
                break;
              case SUB_4x8:
                wp_fill(bx0, by0, 1, 2, ridx);
                wp_fill(bx0 + 1, by0, 1, 2, ridx);
                break;
              default:
                for (int j = 0; j < 4; ++j)
                  wp_fill(bx0 + (j & 1), by0 + (j >> 1), 1, 1, ridx);
                break;
            }
          }
          break;
        default:
          break;
      }
    }
    if (getenv("PIP_DBG_REF") && mb_is_inter(rec.mb_class))
      fprintf(stderr,
              "DBGREC addr=%d refcell=%d,%d,%d,%d reflist=%zu out=%d,%d,%d,%d\n",
              int(n), sc.cur.ref_cell[0], sc.cur.ref_cell[1], sc.cur.ref_cell[2],
              sc.cur.ref_cell[3], reflist.size(), out->ref_frame[n * 16 + 0],
              out->ref_frame[n * 16 + 1], out->ref_frame[n * 16 + 2],
              out->ref_frame[n * 16 + 3]);
    out->slice_id[n] = sc.slice_id;
    out->deblock_idc[n] = u8(sh.disable_deblocking_idc);
    out->alpha_off[n] = i8(sh.alpha_c0_offset);
    out->beta_off[n] = i8(sh.beta_offset);
    out->decoded[n] = 1;
  };

  auto process_slice = [&](const std::vector<u8>& rbsp, const SliceHeader& sh) {
    auto pit = im.pps_map.find(sh.pps_id);
    PIP_CHECK(pit != im.pps_map.end(), "unknown PPS");
    pps = &pit->second;
    sps = &im.sps_map.at(pps->sps_id);
    if (!frame_open) {
      open_frame(*sps, sh);
      first_sh = sh;
      // effective scaling lists / chroma offsets for the frame
      out->use_scaling = sps->seq_scaling_matrix_present || pps->pic_scaling_matrix_present;
      if (pps->pic_scaling_matrix_present) {
        memcpy(out->scaling4, pps->scaling_4x4, sizeof(out->scaling4));
        memcpy(out->scaling8, pps->scaling_8x8, sizeof(out->scaling8));
      } else if (sps->seq_scaling_matrix_present) {
        memcpy(out->scaling4, sps->scaling_4x4, sizeof(out->scaling4));
        memcpy(out->scaling8, sps->scaling_8x8, sizeof(out->scaling8));
      }
      out->chroma_qp_offset = pps->chroma_qp_index_offset;
      out->second_chroma_qp_offset = pps->second_chroma_qp_index_offset;
      out->intra_avail_mode = pps->constrained_intra_pred;
    }
    std::vector<int> reflist;
    if (sh.slice_type == SLICE_P || sh.slice_type == SLICE_SP) {
      // reference: WelsInitRefList errors on an empty DPB for P slices
      // (manage_dec_ref.cpp:115) -> slice lost, MBs concealed
      PIP_CHECK(!im.dpb.empty(), "no reference picture for P slice");
      reflist = build_ref_list(im, *sps, sh);
      out->n_ref_list = int(std::min<size_t>(reflist.size(), 18));
      for (int i = 0; i < out->n_ref_list; ++i) out->ref_list[i] = reflist[i];
    }
    SliceCtx sc;
    sc.begin_slice(sps, pps, &sh, &im.pic);
    compute_slice_group_map(*sps, *pps, sh, im.pic);

    if (!pps->entropy_coding_mode) {
      BitReader br(rbsp.data(), rbsp.size());
      br.seek_bits(sh.header_bits);
      bool isP = sh.slice_type == SLICE_P || sh.slice_type == SLICE_SP;
      int addr = sh.first_mb_in_slice;
      while (true) {
        PIP_CHECK(addr < im.pic.num_mbs(), "slice overrun");
        if (isP) {
          int run = int(br.ue());
          for (int k = 0; k < run; ++k) {
            sc.begin_mb(addr);
            MbRecord skip;
            skip.mb_class = MB_PSKIP;
            derive_mvs(sc, skip);
            skip.qp = u8(sc.cur_qp);
            sc.commit(skip);
            record_mb(addr, skip, sc, sh, reflist);
            addr = next_mb_address(im.pic, addr);
          }
          if (run > 0 && !br.more_rbsp_data()) break;
        }
        sc.begin_mb(addr);
        MbRecord rec;
        parse_mb_cavlc(br, sc, rec);
        if (rec.cbp_luma || rec.cbp_chroma || rec.mb_class == MB_I16x16)
          sc.apply_dqp(rec.dqp);
        else
          sc.last_dqp = 0;
        rec.qp = u8(sc.cur_qp);
        if (mb_is_inter(rec.mb_class)) derive_mvs(sc, rec);
        sc.commit(rec);
        record_mb(addr, rec, sc, sh, reflist);
        addr = next_mb_address(im.pic, addr);
        if (!br.more_rbsp_data()) break;
      }
    } else {
      // CABAC: parse records first, then replay for MV derivation
      CabacSliceParse pr = cabac_parse_slice(rbsp, sc, sh);
      // re-walk to attach MVs/ref + planes (cabac_parse_slice already
      // committed; we need per-MB sc.cur context, so replay on a fresh
      // SliceCtx over a reset picture region)
      SliceCtx sc2;
      sc2.begin_slice(sps, pps, &sh, &im.pic);
      int addr = sh.first_mb_in_slice;
      for (auto& rc : pr.recs) {
        MbRecord rec = rc;
        sc2.begin_mb(addr);
        if (rec.cbp_luma || rec.cbp_chroma || rec.mb_class == MB_I16x16)
          sc2.apply_dqp(rec.dqp);
        else
          sc2.last_dqp = 0;
        if (mb_is_inter(rec.mb_class)) derive_mvs(sc2, rec);
        if (getenv("PIP_DBG_REF") && mb_is_inter(rec.mb_class))
          fprintf(stderr, "DBGREF addr=%d cls=%d nref=%d ref=%d,%d,%d,%d\n",
                  addr, rec.mb_class, sh.num_ref_idx_l0_active,
                  rec.ref_idx[0], rec.ref_idx[1], rec.ref_idx[2], rec.ref_idx[3]);
        // restore i4 modes into working state for plane export
        if (rec.mb_class == MB_I4x4) {
          for (int dd = 0; dd < 16; ++dd)
            sc2.cur.i4_modes[kBlk4x4DecodeOrder[dd]] = i8(rec.i4_modes[dd]);
        } else if (rec.mb_class == MB_I8x8) {
          static const int kTL[4] = {0, 2, 8, 10};
          for (int b = 0; b < 4; ++b) {
            i8 m = i8(rec.i4_modes[b]);
            sc2.cur.i4_modes[kTL[b]] = sc2.cur.i4_modes[kTL[b] + 1] = m;
            sc2.cur.i4_modes[kTL[b] + 4] = sc2.cur.i4_modes[kTL[b] + 5] = m;
          }
        }
        sc2.commit(rec);
        record_mb(addr, rec, sc2, sh, reflist);
        addr = next_mb_address(im.pic, addr);
      }
    }
  };

  // main NAL loop
  while (true) {
    std::vector<u8> rbsp;
    SliceHeader sh;
    bool have_slice = false;
    if (im.have_pending) {
      rbsp = std::move(im.pending_rbsp);
      sh = im.pending_sh;
      im.have_pending = false;
      have_slice = true;
    } else {
      if (im.nal_idx >= im.nals.size()) break;
      auto& u = im.nals[im.nal_idx++];
      const u8* payload = d + u.payload_start;
      size_t plen = u.payload_end - u.payload_start;
      if (plen < 1) continue;
      int type = payload[0] & 0x1f;
      int ref_idc = (payload[0] >> 5) & 3;
      if (type == 7 || type == 8) {
        std::vector<u8> r = ebsp_to_rbsp(payload + 1, plen - 1);
        BitReader br(r.data(), r.size());
        if (type == 7) {
          Sps s = parse_sps(br);
          im.sps_map[s.sps_id] = s;
        } else {
          Pps p = parse_pps(br, im.sps_map);
          im.pps_map[p.pps_id] = p;
        }
        continue;
      }
      if (type != 1 && type != 5) continue;
      rbsp = ebsp_to_rbsp(payload + 1, plen - 1);
      BitReader br(rbsp.data(), rbsp.size());
      // a slice whose header cannot be parsed is dropped (error
      // resilience: reference ParseSliceHeaderSyntaxs error paths)
      try {
        sh = parse_slice_header(br, ref_idc, type, im.sps_map, im.pps_map);
      } catch (const std::exception&) {
        if (frame_open) ++out->lost_slices;
        continue;
      }
      have_slice = true;
    }
    if (!have_slice) break;

    bool newpic = is_new_pic(im.have_prev ? &im.prev_sh : nullptr, sh);
    if (newpic && frame_open) {
      // this slice belongs to the NEXT picture: stash and finish
      im.pending_rbsp = std::move(rbsp);
      im.pending_sh = sh;
      im.have_pending = true;
      break;
    }
    im.prev_sh = sh;
    im.have_prev = true;
    // tolerate mid-slice parse failures: MBs recorded before the error
    // stay valid (decoded=1); the rest of the slice is concealed by the
    // pixel layer (reference: ERROR_CON_SLICE_* modes keep going)
    try {
      process_slice(rbsp, sh);
    } catch (const std::exception&) {
      if (frame_open) {
        ++out->lost_slices;
      } else {
        throw;  // first slice of the stream: nothing to conceal against
      }
    }
  }

  if (!frame_open) return false;
  // close the frame: mark references
  const Pps& fp = im.pps_map.at(first_sh.pps_id);
  const Sps& fs = im.sps_map.at(fp.sps_id);
  mark_refs(im, fs, first_sh, im.output_idx);
  // export the post-marking DPB (future frames can only reference
  // these outputs — the pixel layer's ring-eviction liveness set)
  out->n_dpb_live = 0;
  for (auto& p : im.dpb) {
    if (out->n_dpb_live < 17) out->dpb_live[out->n_dpb_live++] = p.output_idx;
  }
  ++im.output_idx;
  return true;
}

}  // namespace h264pip
