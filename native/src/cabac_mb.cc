#include "cabac_mb.h"

#include "engine.h"  // BillTag
#include "tables.h"

namespace h264pip {

// ---------------------------------------------------------------------------
// Bin-level IO facade: one body serves decode and encode.
// ---------------------------------------------------------------------------
bool g_cabac_log = false;
long g_cabac_log_count = 0;

struct DecIO {
  static constexpr bool kIsWriter = false;
  CabacDec dec;
  CabacContexts* cc;
  const std::vector<u8>* rbsp;
  // bench billing (original bits per BillTag): each decision bills the
  // codeword bits its renormalization pulled (reference: BILL_BITS in the
  // readers, dec_golomb.h:71-82; CABAC split parse_mb_syn_cabac.cpp)
  double* bench = nullptr;
  int tag = BILL_OTHER;
  size_t last_bitpos = 0;

  inline void set_tag(int t) { tag = t; }
  inline void bill_delta() {
    if (bench) {
      size_t p = dec.bitpos();
      bench[tag] += double(p - last_bitpos);
      last_bitpos = p;
    }
  }
  bool d(int ctx, bool) {
    bool b = dec.decision_at(&cc->ctx[ctx], ctx);
    bill_delta();
    return b;
  }
  bool byp(bool) {
    bool b = dec.bypass();
    bill_delta();
    return b;
  }
  bool term(bool) {
    bool b = dec.terminate();
    bill_delta();
    return b;
  }
  // PCM: returns sample pointer handling; reader reads 384 bytes + reinit
  void pcm(u8* samples) {
    size_t pos = dec.consumed_bytes();
    PIP_CHECK(pos + 384 <= rbsp->size(), "PCM overruns slice");
    memcpy(samples, rbsp->data() + pos, 384);
    dec.reinit_at(pos + 384);
    if (bench) {
      bench[BILL_PCM] += double(dec.bitpos() - last_bitpos);
      last_bitpos = dec.bitpos();
    }
  }
};

struct EncIO {
  static constexpr bool kIsWriter = true;
  CabacEnc enc;
  CabacContexts* cc;

  inline void set_tag(int) {}
  bool d(int ctx, bool b) {
    enc.encode(&cc->ctx[ctx], b);
    return b;
  }
  bool byp(bool b) {
    enc.encode_bypass(b);
    return b;
  }
  bool term(bool b) {
    enc.encode_terminate(b);
    return b;
  }
  void pcm(u8* samples) {
    // terminate(1) already encoded by mb_type codec; pad alignment zeros,
    // raw samples, then restart the arithmetic codeword
    enc.flush_align();
    enc.put_bytes(samples, 384);
    enc.reinit();
  }
};

// ---------------------------------------------------------------------------
// neighbor-context helpers
// ---------------------------------------------------------------------------
static inline bool nbr_is_intra_nondc(const MbState* m) {
  return m && (m->mb_class != MB_I4x4 && m->mb_class != MB_I8x8);
}

// AC-block cbf condTerm: in-MB neighbor uses cur nnz; cross-MB uses
// neighbor MB (PCM -> 1); unavailable -> is_intra(cur).
static int cbf_cond_luma(SliceCtx& sc, int blk /*raster*/, bool left) {
  int bx = blk & 3, by = blk >> 2;
  bool cur_intra = mb_is_intra(sc.cur.mb_class);
  if (left) {
    if (bx > 0) return sc.cur.nnz[blk - 1] != 0;
    const MbState* A = sc.nbr(sc.addr_left());
    if (!A) return cur_intra ? 1 : 0;
    if (A->mb_class == MB_PCM) return 1;
    return A->nnz[by * 4 + 3] != 0;
  } else {
    if (by > 0) return sc.cur.nnz[blk - 4] != 0;
    const MbState* B = sc.nbr(sc.addr_above());
    if (!B) return cur_intra ? 1 : 0;
    if (B->mb_class == MB_PCM) return 1;
    return B->nnz[12 + bx] != 0;
  }
}

static int cbf_cond_chroma(SliceCtx& sc, int c, int blk, bool left) {
  int base = 16 + c * 4;
  int bx = blk & 1, by = blk >> 1;
  bool cur_intra = mb_is_intra(sc.cur.mb_class);
  if (left) {
    if (bx > 0) return sc.cur.nnz[base + blk - 1] != 0;
    const MbState* A = sc.nbr(sc.addr_left());
    if (!A) return cur_intra ? 1 : 0;
    if (A->mb_class == MB_PCM) return 1;
    return A->nnz[base + by * 2 + 1] != 0;
  } else {
    if (by > 0) return sc.cur.nnz[base + blk - 2] != 0;
    const MbState* B = sc.nbr(sc.addr_above());
    if (!B) return cur_intra ? 1 : 0;
    if (B->mb_class == MB_PCM) return 1;
    return B->nnz[base + 2 + bx] != 0;
  }
}

static int cbf_cond_dc(SliceCtx& sc, int bit, bool left) {
  bool cur_intra = mb_is_intra(sc.cur.mb_class);
  const MbState* N = sc.nbr(left ? sc.addr_left() : sc.addr_above());
  if (!N) return cur_intra ? 1 : 0;
  if (N->mb_class == MB_PCM) return 1;
  return (N->cbf_dc >> bit) & 1;
}

// mvd neighbor |mvd| contribution for partition top-left cell (raster).
static int mvd_nbr_abs(SliceCtx& sc, int cell, int comp, bool left) {
  int bx = cell & 3, by = cell >> 2;
  if (left) {
    if (bx > 0) {
      if (sc.cur.ref_cell[cell - 1] < 0) return 0;
      i16 v = sc.cur.mvd[cell - 1][comp];
      return v < 0 ? -v : v;
    }
    const MbState* A = sc.nbr(sc.addr_left());
    if (!A || A->ref_cell[by * 4 + 3] < 0) return 0;
    i16 v = A->mvd[by * 4 + 3][comp];
    return v < 0 ? -v : v;
  } else {
    if (by > 0) {
      if (sc.cur.ref_cell[cell - 4] < 0) return 0;
      i16 v = sc.cur.mvd[cell - 4][comp];
      return v < 0 ? -v : v;
    }
    const MbState* B = sc.nbr(sc.addr_above());
    if (!B || B->ref_cell[12 + bx] < 0) return 0;
    i16 v = B->mvd[12 + bx][comp];
    return v < 0 ? -v : v;
  }
}

static int ref_nbr_cond(SliceCtx& sc, int cell, bool left) {
  int bx = cell & 3, by = cell >> 2;
  if (left) {
    if (bx > 0) return sc.cur.ref_cell[cell - 1] > 0;
    const MbState* A = sc.nbr(sc.addr_left());
    if (!A || A->mb_class == MB_PCM) return 0;
    return A->ref_cell[by * 4 + 3] > 0;
  } else {
    if (by > 0) return sc.cur.ref_cell[cell - 4] > 0;
    const MbState* B = sc.nbr(sc.addr_above());
    if (!B || B->mb_class == MB_PCM) return 0;
    return B->ref_cell[12 + bx] > 0;
  }
}

// ---------------------------------------------------------------------------
// primitive codecs
// ---------------------------------------------------------------------------

// EGk via bypass bins (suffix of UEG codings)
template <class BIO>
static u32 code_egk_bypass(BIO& io, int k, u32 val) {
  if (BIO::kIsWriter) {
    u32 v = val;
    while (v >= (1u << k)) {
      io.byp(true);
      v -= (1u << k);
      ++k;
    }
    io.byp(false);
    for (int i = k - 1; i >= 0; --i) io.byp((v >> i) & 1);
    return val;
  } else {
    u32 pre = 0;
    int kk = k;
    while (io.byp(false)) {
      pre += (1u << kk);
      ++kk;
      PIP_CHECK(kk < 30, "EGk runaway");
    }
    u32 suf = 0;
    for (int i = 0; i < kk; ++i) suf = (suf << 1) | u32(io.byp(false));
    return pre + suf;
  }
}

// mvd component: full UEG3 with neighbor ctx
template <class BIO>
static i16 code_mvd(BIO& io, SliceCtx& sc, int cell, int comp, i16 val,
                    bool sub_part = false) {
  // bench resolution by partition class: sub-16x16 partitions carry
  // most of the MVD volume on detailed content and need their own
  // ledger row to see whether the model's MVD contexts keep up
  io.set_tag(sub_part ? (comp == 0 ? BILL_MVD_SUB_X : BILL_MVD_SUB_Y)
                      : (comp == 0 ? BILL_MVD_X : BILL_MVD_Y));
  int base = (comp == 0 ? CTX_MVD_X : CTX_MVD_Y);
  int sum = mvd_nbr_abs(sc, cell, comp, true) + mvd_nbr_abs(sc, cell, comp, false);
  int inc = sum < 3 ? 0 : (sum > 32 ? 2 : 1);
  u32 m = BIO::kIsWriter ? u32(val < 0 ? -val : val) : 0;
  bool nz = io.d(base + inc, m != 0);
  if (!nz) return 0;
  static const int kPos2Ctx[8] = {0, 1, 2, 3, 3, 3, 3, 3};
  u32 u = BIO::kIsWriter ? m - 1 : 0;
  u32 ru = 0;
  bool escaped = false;
  for (int i = 0; i < 8; ++i) {
    bool b = io.d(base + 3 + kPos2Ctx[i], u > u32(i));
    if (!b) break;
    ++ru;
    if (i == 7) escaped = true;
  }
  if (BIO::kIsWriter) escaped = (u >= 8);
  u32 rm;
  if (escaped) {
    u32 suffix = code_egk_bypass(io, 3, BIO::kIsWriter ? u - 8 : 0);
    rm = 8 + suffix + 1;
  } else {
    rm = ru + 1;
  }
  bool neg = io.byp(val < 0);
  i16 out = i16(BIO::kIsWriter ? val : (neg ? -i32(rm) : i32(rm)));
  return out;
}

// residual block: cbf (except 8x8) + significance map + levels.
// cat: 0 I16DC, 1 I16AC, 2 luma4x4, 3 chromaDC, 4 chromaAC, 5 luma8x8.
// coeff points at the scan-span start; n = span length.
template <class BIO>
static int code_cabac_block(BIO& io, SliceCtx& sc, int cat, int cbf_ctx_inc,
                            i16* coeff, int n) {
  static const int kCatOffCbf[6] = {0, 4, 8, 12, 16, 0};
  static const int kCatOffMap[6] = {0, 15, 29, 44, 47, 0};
  static const int kCatOffOne[6] = {0, 10, 20, 30, 39, 0};
  bool is8x8 = (cat == 5);
  // bench billing split: cbf+sig+last = positions (NZ), levels+signs = AC;
  // DC blocks bill whole to their DC tag
  int tag_nz, tag_lvl;
  switch (cat) {
    case 0: tag_nz = tag_lvl = BILL_LUMA_DC; break;
    case 3: tag_nz = tag_lvl = BILL_CHROMA_DC; break;
    case 4: tag_nz = BILL_CHROMA_NZ; tag_lvl = BILL_CHROMA_AC; break;
    default: tag_nz = BILL_LUMA_NZ; tag_lvl = BILL_LUMA_AC; break;
  }
  // luma non-DC blocks bill at sub-decision resolution (cbf / sig /
  // last / sign) so the bench columns can be compared against our
  // recompressed position/sign columns one decision class at a time
  bool sub = (cat == 1 || cat == 2 || cat == 5);
  io.set_tag(sub ? BILL_CABAC_CBF : tag_nz);

  if (!is8x8) {
    int cnt = 0;
    if (BIO::kIsWriter) {
      for (int i = 0; i < n; ++i)
        if (coeff[i]) ++cnt;
    }
    bool cbf = io.d(CTX_CBF + kCatOffCbf[cat] + cbf_ctx_inc, cnt != 0);
    if (!cbf) {
      if (!BIO::kIsWriter) memset(coeff, 0, sizeof(i16) * n);
      return 0;
    }
  }
  // significance map
  int sig_base = is8x8 ? CTX_SIG_8X8 : CTX_SIG + kCatOffMap[cat];
  int last_base = is8x8 ? CTX_LAST_8X8 : CTX_LAST + kCatOffMap[cat];
  bool sig[64];
  int total = 0;
  if (sub) io.set_tag(BILL_CABAC_SIG);
  if (BIO::kIsWriter) {
    int last = -1;
    for (int i = 0; i < n; ++i) {
      sig[i] = coeff[i] != 0;
      if (sig[i]) {
        last = i;
        ++total;
      }
    }
    PIP_CHECK(total > 0, "cabac block with no coeffs");
    for (int i = 0; i < n - 1; ++i) {
      int sctx = is8x8 ? kSigCtx8x8[i] : i;
      if (sub) io.set_tag(BILL_CABAC_SIG);
      io.d(sig_base + sctx, sig[i]);
      if (sig[i]) {
        int lctx = is8x8 ? kLastCtx8x8[i] : i;
        bool is_last = (i == last);
        if (sub) io.set_tag(BILL_CABAC_LAST);
        io.d(last_base + lctx, is_last);
        if (is_last) break;
      }
    }
  } else {
    memset(sig, 0, sizeof(sig));
    bool done = false;
    for (int i = 0; i < n - 1 && !done; ++i) {
      int sctx = is8x8 ? kSigCtx8x8[i] : i;
      if (sub) io.set_tag(BILL_CABAC_SIG);
      if (io.d(sig_base + sctx, false)) {
        sig[i] = true;
        ++total;
        int lctx = is8x8 ? kLastCtx8x8[i] : i;
        if (sub) io.set_tag(BILL_CABAC_LAST);
        if (io.d(last_base + lctx, false)) done = true;
      }
    }
    if (!done) {
      sig[n - 1] = true;
      ++total;
    }
  }
  // levels, from highest scan position down
  io.set_tag(tag_lvl);
  int one_base = is8x8 ? CTX_ONE_8X8 : CTX_ONE + kCatOffOne[cat];
  int abs_base = one_base + 5;
  int max_c2 = (cat == 3) ? 3 : 4;
  int c1 = 1, c2 = 0;
  for (int i = n - 1; i >= 0; --i) {
    if (!sig[i]) {
      if (!BIO::kIsWriter) coeff[i] = 0;
      continue;
    }
    u32 mag = BIO::kIsWriter ? u32(coeff[i] < 0 ? -coeff[i] : coeff[i]) : 0;
    bool gt1 = io.d(one_base + c1, mag > 1);
    u32 rmag;
    if (gt1) {
      // remaining r = mag - 2, TU cap 12 at ctx abs_base+c2, then EG0
      u32 r = BIO::kIsWriter ? mag - 2 : 0;
      u32 rr = 0;
      bool esc = false;
      for (int b = 0; b < 13; ++b) {
        bool bit = io.d(abs_base + c2, r > u32(b));
        if (!bit) break;
        ++rr;
        if (b == 12) esc = true;
      }
      if (BIO::kIsWriter) esc = (r >= 13);
      if (esc) {
        u32 suf = code_egk_bypass(io, 0, BIO::kIsWriter ? r - 13 : 0);
        rr = 13 + suf;
      }
      rmag = rr + 2;
      ++c2;
      if (c2 > max_c2) c2 = max_c2;
      c1 = 0;
    } else {
      rmag = 1;
      if (c1) {
        ++c1;
        if (c1 > 4) c1 = 4;
      }
    }
    if (sub) io.set_tag(BILL_CABAC_SIGN);
    bool neg = io.byp(BIO::kIsWriter ? coeff[i] < 0 : false);
    if (sub) io.set_tag(tag_lvl);
    if (!BIO::kIsWriter) coeff[i] = i16(neg ? -i32(rmag) : i32(rmag));
  }
  return total;
}

// ---------------------------------------------------------------------------
// mb_type codecs
// ---------------------------------------------------------------------------

// I-slice / I-suffix mb_type. base: ctx base (CTX_MB_TYPE_I for I slices,
// where bin0 uses neighbor inc). For the P-slice intra suffix, bins use
// fixed ctxs (handled by caller flags).
template <class BIO>
static void code_mb_type_intra(BIO& io, SliceCtx& sc, MbRecord& rec,
                               bool in_p_slice) {
  // ctxs per spec: I slice: bin0 3+inc, pcm=terminate, then 6,7,8,9,10
  // mapped as base+3..base+7; P suffix: prefix bin (14+3) handled by
  // caller; here: 17(+1=18? no): per reference: b(17) NxN vs I16; term;
  // then 18, 19, 19, 20, 20.
  int c_nxn, c_pred, c_cbp_a, c_cbp_b, c_mode_a, c_mode_b;
  if (in_p_slice) {
    c_nxn = CTX_MB_SKIP_P + 6;     // 17
    c_pred = CTX_MB_SKIP_P + 7;    // 18
    c_cbp_a = CTX_MB_SKIP_P + 8;   // 19
    c_cbp_b = CTX_MB_SKIP_P + 8;   // 19
    c_mode_a = CTX_MB_SKIP_P + 9;  // 20
    c_mode_b = CTX_MB_SKIP_P + 9;  // 20
  } else {
    const MbState* L = sc.nbr(sc.addr_left());
    const MbState* T = sc.nbr(sc.addr_above());
    int inc = (nbr_is_intra_nondc(L) ? 1 : 0) + (nbr_is_intra_nondc(T) ? 1 : 0);
    c_nxn = CTX_MB_TYPE_I + inc;
    c_pred = CTX_MB_TYPE_I + 3;
    c_cbp_a = CTX_MB_TYPE_I + 4;
    c_cbp_b = CTX_MB_TYPE_I + 5;
    c_mode_a = CTX_MB_TYPE_I + 6;
    c_mode_b = CTX_MB_TYPE_I + 7;
  }
  bool not_nxn =
      io.d(c_nxn, rec.mb_class != MB_I4x4 && rec.mb_class != MB_I8x8);
  if (!not_nxn) {
    if (!BIO::kIsWriter) rec.mb_class = MB_I4x4;  // I8x8 via transform flag
    return;
  }
  bool pcm = io.term(rec.mb_class == MB_PCM);
  if (pcm) {
    if (!BIO::kIsWriter) rec.mb_class = MB_PCM;
    return;
  }
  if (!BIO::kIsWriter) rec.mb_class = MB_I16x16;
  bool cbp_l = io.d(c_pred, rec.cbp_luma != 0);
  if (!BIO::kIsWriter) rec.cbp_luma = cbp_l ? 15 : 0;
  bool cbp_c_nz = io.d(c_cbp_a, rec.cbp_chroma != 0);
  if (cbp_c_nz) {
    bool cbp_c2 = io.d(c_cbp_b, rec.cbp_chroma == 2);
    if (!BIO::kIsWriter) rec.cbp_chroma = cbp_c2 ? 2 : 1;
  } else if (!BIO::kIsWriter) {
    rec.cbp_chroma = 0;
  }
  bool m1 = io.d(c_mode_a, (rec.i16_mode >> 1) & 1);
  bool m0 = io.d(c_mode_b, rec.i16_mode & 1);
  if (!BIO::kIsWriter) rec.i16_mode = u8((u32(m1) << 1) | u32(m0));
}

template <class BIO>
static void code_mb_type_p(BIO& io, SliceCtx& sc, MbRecord& rec) {
  int base = CTX_MB_SKIP_P;  // prefix bins at base+3..base+6
  bool intra = io.d(base + 3, mb_is_intra(rec.mb_class));
  if (intra) {
    code_mb_type_intra(io, sc, rec, /*in_p_slice=*/true);
    return;
  }
  bool b1 = io.d(base + 4,
                 rec.mb_class == MB_P16x8 || rec.mb_class == MB_P8x16);
  if (b1) {
    bool b2 = io.d(base + 6, rec.mb_class == MB_P16x8);
    if (!BIO::kIsWriter) rec.mb_class = b2 ? MB_P16x8 : MB_P8x16;
  } else {
    bool b2 = io.d(base + 5, rec.mb_class == MB_P8x8);
    if (!BIO::kIsWriter) rec.mb_class = b2 ? MB_P8x8 : MB_P16x16;
  }
}

// ---------------------------------------------------------------------------
// whole-MB codec (excluding mb_skip_flag and end_of_slice)
// ---------------------------------------------------------------------------
template <class BIO>
static void code_mb_cabac(BIO& io, SliceCtx& sc, MbRecord& rec) {
  bool isP = sc.sh->slice_type == SLICE_P || sc.sh->slice_type == SLICE_SP;
  sc.cur.mb_class = rec.mb_class;  // provisional for writer ctx; reader fixes below

  io.set_tag(BILL_MB_TYPE);
  if (isP) {
    code_mb_type_p(io, sc, rec);
  } else {
    code_mb_type_intra(io, sc, rec, /*in_p_slice=*/false);
  }
  sc.cur.mb_class = rec.mb_class;

  if (rec.mb_class == MB_PCM) {
    io.pcm(rec.pcm);
    sc.last_dqp = 0;  // mb_qp_delta inferred 0 (reference: decode_slice.cpp:950)
    rec.qp = u8(sc.cur_qp);
    return;
  }
  PIP_CHECK(rec.mb_class != MB_P8x8REF0, "P_8x8ref0 has no CABAC binarization");

  // --- mb_pred ---
  if (rec.mb_class == MB_I4x4 || rec.mb_class == MB_I8x8) {
    if (sc.pps->transform_8x8_mode) {
      const MbState* L = sc.nbr(sc.addr_left());
      const MbState* T = sc.nbr(sc.addr_above());
      int inc = (L && L->transform_8x8 ? 1 : 0) + (T && T->transform_8x8 ? 1 : 0);
      io.set_tag(BILL_T8X8);
      bool t8 = io.d(CTX_T8X8 + inc, rec.mb_class == MB_I8x8);
      if (!BIO::kIsWriter) rec.mb_class = t8 ? MB_I8x8 : MB_I4x4;
      rec.transform_8x8 = (rec.mb_class == MB_I8x8);
      sc.cur.mb_class = rec.mb_class;
      sc.cur.transform_8x8 = rec.transform_8x8;
    }
    int nblk = rec.mb_class == MB_I8x8 ? 4 : 16;
    static const int kTopLeft8[4] = {0, 2, 8, 10};
    io.set_tag(rec.mb_class == MB_I8x8 ? BILL_I8_MODE : BILL_I4_MODE);
    for (int d = 0; d < nblk; ++d) {
      int pred = rec.mb_class == MB_I8x8 ? sc.pred_intra_8x8_mode(d)
                                         : sc.pred_intra_4x4_mode(kBlk4x4DecodeOrder[d]);
      int mode = BIO::kIsWriter ? rec.i4_modes[d] : 0;
      bool use_pred = io.d(CTX_IPRED_FLAG, mode == pred);
      if (use_pred) {
        mode = pred;
      } else {
        int remw = BIO::kIsWriter ? (mode < pred ? mode : mode - 1) : 0;
        u32 rem = 0;
        for (int b = 0; b < 3; ++b) {  // FL, LSB-first
          bool bit = io.d(CTX_IPRED_REM, (remw >> b) & 1);
          rem |= u32(bit) << b;
        }
        if (!BIO::kIsWriter) mode = int(rem) + (int(rem) >= pred ? 1 : 0);
      }
      if (!BIO::kIsWriter) rec.i4_modes[d] = u8(mode);
      if (rec.mb_class == MB_I8x8) {
        int tl = kTopLeft8[d];
        sc.cur.i4_modes[tl] = sc.cur.i4_modes[tl + 1] = i8(mode);
        sc.cur.i4_modes[tl + 4] = sc.cur.i4_modes[tl + 5] = i8(mode);
      } else {
        sc.cur.i4_modes[kBlk4x4DecodeOrder[d]] = i8(mode);
      }
    }
  }
  if (mb_is_intra(rec.mb_class) && sc.sps->chroma_format_idc != 0) {
    auto cond = [&](const MbState* N) {
      return N && mb_is_intra(N->mb_class) && N->mb_class != MB_PCM &&
             N->intra_chroma_mode > 0;
    };
    // NB: plain sum (spec 9.3.3.1.1.8), unlike the <<1-weighted incs
    int inc = (cond(sc.nbr(sc.addr_left())) ? 1 : 0) +
              (cond(sc.nbr(sc.addr_above())) ? 1 : 0);
    io.set_tag(BILL_CHROMA_MODE);
    u32 mode = BIO::kIsWriter ? rec.chroma_mode : 0;
    bool nz = io.d(CTX_CHROMA_MODE + inc, mode != 0);
    if (nz) {
      bool b1 = io.d(CTX_CHROMA_MODE + 3, mode >= 2);
      if (b1) {
        bool b2 = io.d(CTX_CHROMA_MODE + 3, mode == 3);
        if (!BIO::kIsWriter) mode = b2 ? 3 : 2;
      } else if (!BIO::kIsWriter) {
        mode = 1;
      }
    } else if (!BIO::kIsWriter) {
      mode = 0;
    }
    if (!BIO::kIsWriter) rec.chroma_mode = u8(mode);
    sc.cur.intra_chroma_mode = u8(mode);
  }
  if (mb_is_inter(rec.mb_class)) {
    int num_ref = sc.sh->num_ref_idx_l0_active;
    // sub_mb types first (P8x8)
    if (rec.mb_class == MB_P8x8) {
      io.set_tag(BILL_SUB_MB);
      for (int i = 0; i < 4; ++i) {
        u32 st = BIO::kIsWriter ? rec.sub_types[i] : 0;
        bool b0 = io.d(CTX_SUB_MB_P, st == SUB_8x8);
        if (!b0) {
          bool b1 = io.d(CTX_SUB_MB_P + 1, st != SUB_8x4);
          if (b1) {
            bool b2 = io.d(CTX_SUB_MB_P + 2, st == SUB_4x8);
            if (!BIO::kIsWriter) st = b2 ? SUB_4x8 : SUB_4x4;
          } else if (!BIO::kIsWriter) {
            st = SUB_8x4;
          }
        } else if (!BIO::kIsWriter) {
          st = SUB_8x8;
        }
        if (!BIO::kIsWriter) rec.sub_types[i] = u8(st);
        sc.cur.sub_types[i] = rec.sub_types[i];
      }
    }
    // ref idx per partition
    struct Part {
      int cell;  // raster top-left 4x4 cell
      int ref_slot;
    };
    Part parts[4];
    int nparts = 0;
    switch (rec.mb_class) {
      case MB_P16x16: parts[nparts++] = {0, 0}; break;
      case MB_P16x8:
        parts[nparts++] = {0, 0};
        parts[nparts++] = {8, 1};
        break;
      case MB_P8x16:
        parts[nparts++] = {0, 0};
        parts[nparts++] = {2, 1};
        break;
      default:
        for (int i = 0; i < 4; ++i)
          parts[nparts++] = {(i >> 1) * 8 + (i & 1) * 2, i};
        break;
    }
    io.set_tag(BILL_REF);
    for (int p = 0; p < nparts; ++p) {
      i8 ref = 0;
      if (num_ref > 1) {
        int inc = ref_nbr_cond(sc, parts[p].cell, true) +
                  2 * ref_nbr_cond(sc, parts[p].cell, false);
        u32 r = BIO::kIsWriter ? u32(rec.ref_idx[parts[p].ref_slot]) : 0;
        bool nz = io.d(CTX_REF_IDX + inc, r != 0);
        if (nz) {
          // unary: bin1 at +4, further bins at +5
          u32 u = BIO::kIsWriter ? r - 1 : 0;
          bool more = io.d(CTX_REF_IDX + 4, u >= 1);
          u32 cnt = 0;
          if (more) {
            cnt = 1;
            while (io.d(CTX_REF_IDX + 5, u >= cnt + 1)) {
              ++cnt;
              PIP_CHECK(cnt < 64, "ref idx runaway");
            }
          }
          r = cnt + 1;
        } else {
          r = 0;
        }
        PIP_CHECK(int(r) < num_ref, "ref_idx out of range");
        ref = i8(r);
      }
      if (!BIO::kIsWriter) rec.ref_idx[parts[p].ref_slot] = ref;
      // replicate ref into cells of the partition for later ctx
      {
        int bx = parts[p].cell & 3, by = parts[p].cell >> 2;
        int w = rec.mb_class == MB_P8x16 ? 2 : (rec.mb_class == MB_P16x8 || rec.mb_class == MB_P16x16 ? 4 : 2);
        int h = rec.mb_class == MB_P16x8 ? 2 : (rec.mb_class == MB_P8x16 || rec.mb_class == MB_P16x16 ? 4 : 2);
        if (rec.mb_class == MB_P16x16) w = h = 4;
        for (int y = by; y < by + h; ++y)
          for (int x = bx; x < bx + w; ++x)
            sc.cur.ref_cell[y * 4 + x] = rec.ref_idx[parts[p].ref_slot];
      }
    }
    // mvd per partition (and sub-partition)
    auto do_mvd = [&](int cell, int slot, int w, int h) {
      for (int comp = 0; comp < 2; ++comp) {
        i16 v = code_mvd(io, sc, cell, comp,
                         BIO::kIsWriter ? rec.mvd[slot][comp] : i16(0),
                         rec.mb_class != MB_P16x16);
        if (!BIO::kIsWriter) rec.mvd[slot][comp] = v;
      }
      int bx = cell & 3, by = cell >> 2;
      for (int y = by; y < by + h; ++y)
        for (int x = bx; x < bx + w; ++x) {
          sc.cur.mvd[y * 4 + x][0] = rec.mvd[slot][0];
          sc.cur.mvd[y * 4 + x][1] = rec.mvd[slot][1];
        }
    };
    switch (rec.mb_class) {
      case MB_P16x16: do_mvd(0, 0, 4, 4); break;
      case MB_P16x8:
        do_mvd(0, 0, 4, 2);
        do_mvd(8, 1, 4, 2);
        break;
      case MB_P8x16:
        do_mvd(0, 0, 2, 4);
        do_mvd(2, 1, 2, 4);
        break;
      default:
        for (int i = 0; i < 4; ++i) {
          int bx0 = (i & 1) * 2, by0 = (i >> 1) * 2;
          int tl = by0 * 4 + bx0;
          switch (rec.sub_types[i]) {
            case SUB_8x8: do_mvd(tl, 4 * i, 2, 2); break;
            case SUB_8x4:
              do_mvd(tl, 4 * i, 2, 1);
              do_mvd(tl + 4, 4 * i + 1, 2, 1);
              break;
            case SUB_4x8:
              do_mvd(tl, 4 * i, 1, 2);
              do_mvd(tl + 1, 4 * i + 1, 1, 2);
              break;
            default:
              do_mvd(tl, 4 * i, 1, 1);
              do_mvd(tl + 1, 4 * i + 1, 1, 1);
              do_mvd(tl + 4, 4 * i + 2, 1, 1);
              do_mvd(tl + 5, 4 * i + 3, 1, 1);
              break;
          }
        }
        break;
    }
  }

  // --- CBP (non-I16) ---
  if (rec.mb_class != MB_I16x16) {
    const MbState* L = sc.nbr(sc.addr_left());
    const MbState* T = sc.nbr(sc.addr_above());
    auto lok = [&](int bit) {
      return L && L->mb_class != MB_PCM && !((L->cbp_luma >> bit) & 1);
    };
    auto tok = [&](int bit) {
      return T && T->mb_class != MB_PCM && !((T->cbp_luma >> bit) & 1);
    };
    io.set_tag(BILL_CBP_LUMA);
    u32 cbp = BIO::kIsWriter ? rec.cbp_luma : 0;
    bool b0 = io.d(CTX_CBP_LUMA + (lok(1) ? 1 : 0) + (tok(2) ? 2 : 0), cbp & 1);
    bool b1 = io.d(CTX_CBP_LUMA + (!b0 ? 1 : 0) + (tok(3) ? 2 : 0), (cbp >> 1) & 1);
    bool b2 = io.d(CTX_CBP_LUMA + (lok(3) ? 1 : 0) + (!b0 ? 2 : 0), (cbp >> 2) & 1);
    bool b3 = io.d(CTX_CBP_LUMA + (!b2 ? 1 : 0) + (!b1 ? 2 : 0), (cbp >> 3) & 1);
    if (!BIO::kIsWriter)
      rec.cbp_luma = u8(u32(b0) | (u32(b1) << 1) | (u32(b2) << 2) | (u32(b3) << 3));
    if (sc.sps->chroma_format_idc != 0) {
      auto cnz = [&](const MbState* N) {
        return N && (N->mb_class == MB_PCM || N->cbp_chroma > 0);
      };
      auto c2f = [&](const MbState* N) {
        return N && (N->mb_class == MB_PCM || N->cbp_chroma == 2);
      };
      int inc = (cnz(L) ? 1 : 0) + (cnz(T) ? 2 : 0);
      io.set_tag(BILL_CBP_CHROMA);
      bool cb0 = io.d(CTX_CBP_CHROMA + inc, rec.cbp_chroma != 0);
      if (cb0) {
        int inc2 = (c2f(L) ? 1 : 0) + (c2f(T) ? 2 : 0);
        bool cb1 = io.d(CTX_CBP_CHROMA + 4 + inc2, rec.cbp_chroma == 2);
        if (!BIO::kIsWriter) rec.cbp_chroma = cb1 ? 2 : 1;
      } else if (!BIO::kIsWriter) {
        rec.cbp_chroma = 0;
      }
    }
    sc.cur.cbp_luma = rec.cbp_luma;
    sc.cur.cbp_chroma = rec.cbp_chroma;
    // inter transform_8x8 flag (after CBP)
    if (mb_is_inter(rec.mb_class) && sc.pps->transform_8x8_mode &&
        rec.cbp_luma != 0) {
      bool elig = true;
      if (rec.mb_class == MB_P8x8 || rec.mb_class == MB_P8x8REF0) {
        for (int i = 0; i < 4; ++i)
          if (rec.sub_types[i] != SUB_8x8) elig = false;
      }
      if (elig) {
        int inc = (L && L->transform_8x8 ? 1 : 0) + (T && T->transform_8x8 ? 1 : 0);
        io.set_tag(BILL_T8X8);
        bool t8 = io.d(CTX_T8X8 + inc, rec.transform_8x8);
        if (!BIO::kIsWriter) rec.transform_8x8 = t8;
        sc.cur.transform_8x8 = rec.transform_8x8;
      }
    }
  } else {
    sc.cur.cbp_luma = rec.cbp_luma;
    sc.cur.cbp_chroma = rec.cbp_chroma;
  }

  // --- residuals ---
  bool has_res =
      rec.cbp_luma != 0 || rec.cbp_chroma != 0 || rec.mb_class == MB_I16x16;
  if (!has_res) {
    if (!BIO::kIsWriter) rec.dqp = 0;
    sc.last_dqp = 0;
    rec.qp = u8(sc.cur_qp);
    return;
  }
  // delta QP
  {
    io.set_tag(BILL_QP);
    int inc = sc.last_dqp != 0 ? 1 : 0;
    i32 dqp = BIO::kIsWriter ? rec.dqp : 0;
    bool nz = io.d(CTX_DQP + inc, dqp != 0);
    if (nz) {
      // v = 2|dqp| - (dqp>0); unary of (v-1): bin@+2 then bins@+3
      u32 v = BIO::kIsWriter ? u32(dqp > 0 ? 2 * dqp - 1 : -2 * dqp) : 0;
      u32 t = BIO::kIsWriter ? v - 1 : 0;
      u32 cnt = 0;
      if (io.d(CTX_DQP + 2, t >= 1)) {
        cnt = 1;
        while (io.d(CTX_DQP + 3, t >= cnt + 1)) {
          ++cnt;
          PIP_CHECK(cnt < 128, "dqp runaway");
        }
      }
      if (!BIO::kIsWriter) {
        u32 u = cnt + 1 + 1;  // uiCode = unary + 1; then +1 in formula
        i32 d = i32((u) >> 1);
        dqp = ((cnt + 1) & 1) ? d : -d;
      }
    } else {
      dqp = 0;
    }
    PIP_CHECK(dqp >= -26 && dqp <= 25, "mb_qp_delta out of range");
    if (!BIO::kIsWriter) rec.dqp = i8(dqp);
    sc.apply_dqp(rec.dqp);
    rec.qp = u8(sc.cur_qp);
  }
  bool is_i16 = rec.mb_class == MB_I16x16;
  if (is_i16) {
    // luma DC, cat 0
    int inc = cbf_cond_dc(sc, 0, true) + 2 * cbf_cond_dc(sc, 0, false);
    int cnt = code_cabac_block(io, sc, 0, inc, rec.luma_dc, 16);
    if (cnt) sc.cur.cbf_dc |= 1;
    if (rec.cbp_luma) {
      for (int d = 0; d < 16; ++d) {
        int r = kBlk4x4DecodeOrder[d];
        int binc = cbf_cond_luma(sc, r, true) + 2 * cbf_cond_luma(sc, r, false);
        int c = code_cabac_block(io, sc, 1, binc, &rec.luma_ac[r][1], 15);
        sc.cur.nnz[r] = u8(c);
      }
    }
  } else if (rec.transform_8x8) {
    for (int i8x = 0; i8x < 4; ++i8x) {
      if (!(rec.cbp_luma & (1 << i8x))) continue;
      int c = code_cabac_block(io, sc, 5, 0, rec.luma_ac8[i8x], 64);
      // CABAC nnz cache: all four sub-4x4 cells get the 8x8 total
      static const int kTopLeft8[4] = {0, 2, 8, 10};
      int tl = kTopLeft8[i8x];
      sc.cur.nnz[tl] = sc.cur.nnz[tl + 1] = sc.cur.nnz[tl + 4] =
          sc.cur.nnz[tl + 5] = u8(c);
    }
  } else {
    for (int i8x = 0; i8x < 4; ++i8x) {
      if (!(rec.cbp_luma & (1 << i8x))) continue;
      for (int b = 0; b < 4; ++b) {
        int r = kBlk4x4DecodeOrder[i8x * 4 + b];
        int binc = cbf_cond_luma(sc, r, true) + 2 * cbf_cond_luma(sc, r, false);
        int c = code_cabac_block(io, sc, 2, binc, rec.luma_ac[r], 16);
        sc.cur.nnz[r] = u8(c);
      }
    }
  }
  if (rec.cbp_chroma == 1 || rec.cbp_chroma == 2) {
    for (int c = 0; c < 2; ++c) {
      int bit = 1 + c;
      int inc = cbf_cond_dc(sc, bit, true) + 2 * cbf_cond_dc(sc, bit, false);
      int cnt = code_cabac_block(io, sc, 3, inc, rec.chroma_dc[c], 4);
      if (cnt) sc.cur.cbf_dc |= u8(1 << bit);
    }
  }
  if (rec.cbp_chroma == 2) {
    for (int c = 0; c < 2; ++c) {
      for (int b = 0; b < 4; ++b) {
        int binc =
            cbf_cond_chroma(sc, c, b, true) + 2 * cbf_cond_chroma(sc, c, b, false);
        int cnt = code_cabac_block(io, sc, 4, binc, &rec.chroma_ac[c * 4 + b][1], 15);
        sc.cur.nnz[16 + c * 4 + b] = u8(cnt);
      }
    }
  }
}

// ---------------------------------------------------------------------------
// slice-level drivers
// ---------------------------------------------------------------------------
template <class BIO>
static void cabac_slice_loop(BIO& io, SliceCtx& sc, const SliceHeader& sh,
                             std::vector<MbRecord>* recs, bool writer_mode) {
  bool isP = sh.slice_type == SLICE_P || sh.slice_type == SLICE_SP;
  int addr = sh.first_mb_in_slice;
  size_t k = 0;
  while (true) {
    PIP_CHECK(addr < sc.pic->num_mbs(), "cabac slice overruns picture");
    sc.begin_mb(addr);
    MbRecord local;
    MbRecord& rec = writer_mode ? (*recs)[k] : local;
    if (!writer_mode) rec = MbRecord();
    bool skip = false;
    if (isP) {
      const MbState* L = sc.nbr(sc.addr_left());
      const MbState* T = sc.nbr(sc.addr_above());
      int inc = (L && !L->skip_flag ? 1 : 0) + (T && !T->skip_flag ? 1 : 0);
      io.set_tag(BILL_SKIP);
      skip = io.d(CTX_MB_SKIP_P + inc, rec.mb_class == MB_PSKIP);
      if (skip && !BIO::kIsWriter) rec.mb_class = MB_PSKIP;
    }
    if (skip) {
      if (!BIO::kIsWriter) rec.mb_class = MB_PSKIP;
      sc.last_dqp = 0;
      rec.qp = u8(sc.cur_qp);
    } else {
      code_mb_cabac(io, sc, rec);
    }
    sc.commit(rec);
    if (!writer_mode) recs->push_back(rec);
    ++k;
    if (!BIO::kIsWriter && getenv("PIP_DEBUG_MB")) {
      fprintf(stderr, "[mb %zu] addr=%d cls=%d cbp=%d/%d dqp=%d t8=%d\n", k - 1,
              addr, rec.mb_class, rec.cbp_luma, rec.cbp_chroma, rec.dqp,
              rec.transform_8x8);
    }
    io.set_tag(BILL_END);
    bool end = io.term(writer_mode ? (k == recs->size()) : false);
    addr = next_mb_address(*sc.pic, addr);
    if (end) break;
    if (writer_mode) PIP_CHECK(k < recs->size(), "cabac writer record underrun");
  }
}

CabacSliceParse cabac_parse_slice(const std::vector<u8>& rbsp, SliceCtx& sc,
                                  const SliceHeader& sh) {
  static bool log_init = [] {
    g_cabac_log = getenv("PIP_CABAC_LOG") != nullptr;
    return true;
  }();
  (void)log_init;
  CabacSliceParse out;
  // cabac_alignment_one_bits
  size_t bit = sh.header_bits;
  while (bit & 7) {
    size_t byte = bit >> 3;
    PIP_CHECK(byte < rbsp.size() && ((rbsp[byte] >> (7 - (bit & 7))) & 1),
              "bad cabac alignment bits");
    ++bit;
  }
  size_t start_byte = bit >> 3;

  DecIO io;
  CabacContexts cc;
  cc.init(sh.slice_type == SLICE_I || sh.slice_type == SLICE_SI,
          sh.cabac_init_idc, sh.slice_qp);
  io.cc = &cc;
  io.rbsp = &rbsp;
  io.bench = sc.bench;
  io.dec.init(rbsp.data(), rbsp.size(), start_byte);
  if (io.bench) {
    // 9-bit codeword warmup: arithmetic-coder overhead, not syntax
    io.bench[BILL_TRAILING] += double(io.dec.bitpos() - start_byte * 8);
    io.last_bitpos = io.dec.bitpos();
  }

  cabac_slice_loop(io, sc, sh, &out.recs, /*writer_mode=*/false);
  out.end_byte = io.dec.consumed_bytes();
  return out;
}

std::vector<u8> cabac_write_slice(const std::vector<MbRecord>& recs,
                                  SliceCtx& sc, const SliceHeader& sh,
                                  const u8* hdr_bytes, size_t header_bits) {
  BitWriter bw;
  bw.append_bits(hdr_bytes, 0, header_bits);
  while (!bw.byte_aligned()) bw.put_bit(1);  // cabac_alignment_one_bits
  std::vector<u8> head = bw.take();

  EncIO io;
  CabacContexts cc;
  cc.init(sh.slice_type == SLICE_I || sh.slice_type == SLICE_SI,
          sh.cabac_init_idc, sh.slice_qp);
  io.cc = &cc;
  io.enc.init();

  auto recs_copy = recs;  // writer mutates rec.qp fields via loop
  cabac_slice_loop(io, sc, sh, &recs_copy, /*writer_mode=*/true);
  io.enc.flush_slice_end();
  std::vector<u8> data = io.enc.take();
  head.insert(head.end(), data.begin(), data.end());
  return head;
}

}  // namespace h264pip
