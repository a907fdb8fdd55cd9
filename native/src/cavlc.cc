#include "cavlc.h"

#include "engine.h"  // BillTag
#include "tables.h"

namespace h264pip {

// ---------------------------------------------------------------------------
// VLC primitives
// ---------------------------------------------------------------------------

// Decode via a 16-bit-peek LUT built once per table from its encode-side
// {val,len} entries (replaces a linear scan; the reference uses hand-built
// multi-level tables, decoder_data_tables.cpp).
struct VlcLut {
  std::vector<u16> t;  // (idx << 5) | len; 0 = invalid codeword

  void build(const VlcCode* table, int n) {
    t.assign(65536, 0);
    for (int i = 0; i < n; ++i) {
      if (!table[i].len) continue;
      u32 base = u32(table[i].val) << (16 - table[i].len);
      u32 cnt = 1u << (16 - table[i].len);
      for (u32 k = 0; k < cnt; ++k) t[base + k] = u16((u32(i) << 5) | table[i].len);
    }
  }
};

struct VlcLuts {
  VlcLut coeff_token[5];
  VlcLut total_zeros[16];
  VlcLut total_zeros_cdc[4];
  VlcLut run_before[8];

  VlcLuts() {
    for (int c = 0; c < 5; ++c) coeff_token[c].build(&kCoeffToken[c][0][0], 17 * 4);
    for (int tc = 1; tc < 16; ++tc) total_zeros[tc].build(kTotalZeros[tc], 16);
    for (int tc = 1; tc < 4; ++tc) total_zeros_cdc[tc].build(kTotalZerosChromaDc[tc], 4);
    for (int z = 1; z < 8; ++z) run_before[z].build(kRunBefore[z], 15);
  }
};
static const VlcLuts g_luts;

static inline int vlc_decode_lut(BitReader& br, const VlcLut& lut) {
  u16 e = lut.t[br.peek(16)];
  PIP_CHECK(e != 0, "vlc decode failed");
  br.u(e & 31);
  return int(e >> 5);
}

// coeff_token: returns (total_coeff, trailing_ones)
static void parse_coeff_token(BitReader& br, int nC, int* tc, int* t1) {
  int cls = nc_class(nC);
  if (cls == 3) {  // nC >= 8: 6-bit FLC
    u32 code = br.u(6);
    if (code == 3) {
      *tc = 0;
      *t1 = 0;
    } else {
      *tc = int(code >> 2) + 1;
      *t1 = int(code & 3);
    }
    return;
  }
  int idx = vlc_decode_lut(br, g_luts.coeff_token[cls]);
  *tc = idx / 4;
  *t1 = idx % 4;
}

static void write_coeff_token(BitWriter& bw, int nC, int tc, int t1) {
  int cls = nc_class(nC);
  const VlcCode& c = kCoeffToken[cls][tc][t1];
  PIP_CHECK(c.len > 0, "invalid coeff_token");
  bw.put(c.val, c.len);
}

static int parse_level_prefix(BitReader& br) {
  int zeros = 0;
  while (br.bit() == 0) {
    ++zeros;
    PIP_CHECK(zeros <= 32, "level_prefix too long");
  }
  return zeros;
}

// level <-> (prefix, suffix) per 9.2.2.1. Decode:
static i32 parse_level(BitReader& br, int suffixLength) {
  int prefix = parse_level_prefix(br);
  int suffixSize = suffixLength;
  if (prefix == 14 && suffixLength == 0) suffixSize = 4;
  else if (prefix >= 15) suffixSize = prefix - 3;
  i32 levelCode = i32(std::min(15, prefix)) << suffixLength;
  if (suffixSize > 0) levelCode += i32(br.u(suffixSize));
  if (prefix >= 15 && suffixLength == 0) levelCode += 15;
  if (prefix >= 16) levelCode += (1 << (prefix - 3)) - 4096;
  return levelCode;
}

// Encode levelCode with the canonical minimal representation (the exact
// inverse of parse_level).
static void write_level(BitWriter& bw, i32 levelCode, int suffixLength) {
  PIP_CHECK(levelCode >= 0, "negative levelCode");
  auto put_prefix = [&](int p) { bw.put(1, p + 1); };  // p zeros then 1
  if (suffixLength == 0) {
    if (levelCode < 14) {
      put_prefix(levelCode);
    } else if (levelCode < 30) {
      put_prefix(14);
      bw.put(u32(levelCode - 14), 4);
    } else if (levelCode < 30 + 4096) {
      put_prefix(15);
      bw.put(u32(levelCode - 30), 12);
    } else {
      // prefix p >= 16: levelCode = 30 + suffix + (1<<(p-3)) - 4096
      int p = 16;
      while (levelCode - 30 - ((1 << (p - 3)) - 4096) >= (1 << (p - 3))) ++p;
      put_prefix(p);
      bw.put(u32(levelCode - 30 - ((1 << (p - 3)) - 4096)), p - 3);
    }
  } else {
    if (levelCode < (15 << suffixLength)) {
      put_prefix(levelCode >> suffixLength);
      bw.put(u32(levelCode) & ((1u << suffixLength) - 1), suffixLength);
    } else if (levelCode < (15 << suffixLength) + 4096) {
      put_prefix(15);
      bw.put(u32(levelCode - (15 << suffixLength)), 12);
    } else {
      int base = 15 << suffixLength;
      int p = 16;
      while (levelCode - base - ((1 << (p - 3)) - 4096) >= (1 << (p - 3))) ++p;
      put_prefix(p);
      bw.put(u32(levelCode - base - ((1 << (p - 3)) - 4096)), p - 3);
    }
  }
}

int cavlc_parse_residual(BitReader& br, int nC, int maxNumCoeff, i16* coeff,
                         double* bench, int tag_nz, int tag_lvl, int tag_run) {
  memset(coeff, 0, sizeof(i16) * maxNumCoeff);
  size_t p0 = br.pos_bits();
  auto bill = [&](int tag) {
    if (bench) {
      size_t p = br.pos_bits();
      bench[tag] += double(p - p0);
      p0 = p;
    }
  };
  int tc, t1;
  parse_coeff_token(br, nC, &tc, &t1);
  bill(tag_nz);
  if (tc == 0) return 0;
  PIP_CHECK(tc <= maxNumCoeff, "total_coeff > maxNumCoeff");
  i32 level[16];
  int suffixLength = (tc > 10 && t1 < 3) ? 1 : 0;
  for (int i = 0; i < tc; ++i) {
    if (i < t1) {
      level[i] = br.bit() ? -1 : 1;
    } else {
      i32 levelCode = parse_level(br, suffixLength);
      if (i == t1 && t1 < 3) levelCode += 2;
      level[i] = (levelCode & 1) ? -((levelCode + 1) >> 1) : ((levelCode + 2) >> 1);
      if (suffixLength == 0) suffixLength = 1;
      i32 absL = level[i] < 0 ? -level[i] : level[i];
      if (absL > (3 << (suffixLength - 1)) && suffixLength < 6) ++suffixLength;
    }
  }
  bill(tag_lvl);
  int totalZeros = 0;
  if (tc < maxNumCoeff) {
    if (maxNumCoeff == 4) {
      totalZeros = vlc_decode_lut(br, g_luts.total_zeros_cdc[tc]);
    } else {
      totalZeros = vlc_decode_lut(br, g_luts.total_zeros[tc]);
    }
  }
  int run[16];
  int zerosLeft = totalZeros;
  for (int i = 0; i < tc - 1; ++i) {
    run[i] = 0;
    if (zerosLeft > 0) {
      int zl = std::min(zerosLeft, 7);
      run[i] = vlc_decode_lut(br, g_luts.run_before[zl]);
      zerosLeft -= run[i];
    }
  }
  run[tc - 1] = zerosLeft;
  bill(tag_run);
  int coeffNum = -1;
  for (int i = tc - 1; i >= 0; --i) {
    coeffNum += run[i] + 1;
    PIP_CHECK(coeffNum < maxNumCoeff, "coeff placement overflow");
    coeff[coeffNum] = i16(level[i]);
  }
  return tc;
}

void cavlc_write_residual(BitWriter& bw, int nC, int maxNumCoeff,
                          const i16* coeff) {
  // gather nonzeros from highest scan position down
  i32 level[16];
  int run[16];
  int tc = 0;
  int last = -1;
  {
    int prev_pos = -1;
    for (int pos = maxNumCoeff - 1; pos >= 0; --pos) {
      if (coeff[pos] != 0) {
        if (last < 0) last = pos;
        level[tc] = coeff[pos];
        ++tc;
      }
    }
    (void)prev_pos;
  }
  if (tc == 0) {
    write_coeff_token(bw, nC, 0, 0);
    return;
  }
  // runs: run[i] = zeros between level i and the next lower nonzero
  {
    int i = 0;
    int zeros = 0;
    int pos = last;
    int prev_nz = last;
    for (pos = last - 1; pos >= 0; --pos) {
      if (coeff[pos] != 0) {
        run[i++] = prev_nz - pos - 1;
        prev_nz = pos;
      }
    }
    run[tc - 1] = prev_nz;  // zeros below the lowest nonzero
    (void)zeros;
  }
  int totalZeros = last + 1 - tc;
  int t1 = 0;
  while (t1 < tc && t1 < 3 && (level[t1] == 1 || level[t1] == -1)) ++t1;
  write_coeff_token(bw, nC, tc, t1);
  int suffixLength = (tc > 10 && t1 < 3) ? 1 : 0;
  for (int i = 0; i < tc; ++i) {
    if (i < t1) {
      bw.put_bit(level[i] < 0 ? 1 : 0);
    } else {
      i32 L = level[i];
      i32 levelCode = L > 0 ? 2 * L - 2 : -2 * L - 1;
      if (i == t1 && t1 < 3) levelCode -= 2;
      write_level(bw, levelCode, suffixLength);
      if (suffixLength == 0) suffixLength = 1;
      i32 absL = L < 0 ? -L : L;
      if (absL > (3 << (suffixLength - 1)) && suffixLength < 6) ++suffixLength;
    }
  }
  if (tc < maxNumCoeff) {
    const VlcCode& c = (maxNumCoeff == 4) ? kTotalZerosChromaDc[tc][totalZeros]
                                          : kTotalZeros[tc][totalZeros];
    PIP_CHECK(c.len > 0, "invalid total_zeros code");
    bw.put(c.val, c.len);
  }
  int zerosLeft = totalZeros;
  for (int i = 0; i < tc - 1; ++i) {
    if (zerosLeft > 0) {
      int zl = std::min(zerosLeft, 7);
      const VlcCode& c = kRunBefore[zl][run[i]];
      PIP_CHECK(c.len > 0, "invalid run_before code");
      bw.put(c.val, c.len);
      zerosLeft -= run[i];
    }
  }
}

// ---------------------------------------------------------------------------
// Macroblock-level parse
// ---------------------------------------------------------------------------

// Residual data (spec 7.3.5.3), shared structure notes:
//  - I16x16: DC block first (16 coeffs), AC blocks have 15 coeffs at scan
//    positions 1..15.
//  - 8x8 transform (CAVLC): each 8x8 block is coded as 4 interleaved 4x4
//    blocks; sub-block b holds 8x8 scan positions 4k+b.
static void parse_residuals(BitReader& br, SliceCtx& ctx, MbRecord& rec) {
  double* bb = ctx.bench;
  bool is_i16 = rec.mb_class == MB_I16x16;
  if (is_i16) {
    int nC = ctx.nC_luma(0);
    cavlc_parse_residual(br, nC, 16, rec.luma_dc, bb, BILL_LUMA_DC,
                         BILL_LUMA_DC, BILL_LUMA_DC);
  }
  for (int i8 = 0; i8 < 4; ++i8) {
    if (!(rec.cbp_luma & (1 << i8))) continue;
    if (rec.transform_8x8) {
      for (int b = 0; b < 4; ++b) {
        int d = i8 * 4 + b;
        int r = kBlk4x4DecodeOrder[d];
        i16 tmp[16];
        int nC = ctx.nC_luma(r);
        int tc = cavlc_parse_residual(br, nC, 16, tmp, bb, BILL_LUMA_NZ,
                                      BILL_LUMA_AC, BILL_LUMA_RUN);
        for (int k = 0; k < 16; ++k) rec.luma_ac8[i8][4 * k + b] = tmp[k];
        ctx.cur.nnz[r] = u8(tc);
        rec.nnz[r] = u8(tc);
      }
    } else {
      for (int b = 0; b < 4; ++b) {
        int d = i8 * 4 + b;
        int r = kBlk4x4DecodeOrder[d];
        int nC = ctx.nC_luma(r);
        int tc;
        if (is_i16) {
          tc = cavlc_parse_residual(br, nC, 15, &rec.luma_ac[r][1], bb,
                                    BILL_LUMA_NZ, BILL_LUMA_AC, BILL_LUMA_RUN);
        } else {
          tc = cavlc_parse_residual(br, nC, 16, rec.luma_ac[r], bb,
                                    BILL_LUMA_NZ, BILL_LUMA_AC, BILL_LUMA_RUN);
        }
        ctx.cur.nnz[r] = u8(tc);
        rec.nnz[r] = u8(tc);
      }
    }
  }
  if (rec.cbp_chroma != 0) {
    for (int c = 0; c < 2; ++c) {
      cavlc_parse_residual(br, -1, 4, rec.chroma_dc[c], bb, BILL_CHROMA_DC,
                           BILL_CHROMA_DC, BILL_CHROMA_DC);
    }
  }
  if (rec.cbp_chroma == 2) {
    for (int c = 0; c < 2; ++c) {
      for (int b = 0; b < 4; ++b) {
        int nC = ctx.nC_chroma(c, b);
        int tc = cavlc_parse_residual(br, nC, 15, &rec.chroma_ac[c * 4 + b][1],
                                      bb, BILL_CHROMA_NZ, BILL_CHROMA_AC,
                                      BILL_CHROMA_RUN);
        ctx.cur.nnz[16 + c * 4 + b] = u8(tc);
        rec.nnz[16 + c * 4 + b] = u8(tc);
      }
    }
  }
}

static void write_residuals(BitWriter& bw, SliceCtx& ctx, const MbRecord& rec) {
  bool is_i16 = rec.mb_class == MB_I16x16;
  if (is_i16) {
    int nC = ctx.nC_luma(0);
    cavlc_write_residual(bw, nC, 16, rec.luma_dc);
  }
  for (int i8 = 0; i8 < 4; ++i8) {
    if (!(rec.cbp_luma & (1 << i8))) continue;
    if (rec.transform_8x8) {
      for (int b = 0; b < 4; ++b) {
        int d = i8 * 4 + b;
        int r = kBlk4x4DecodeOrder[d];
        i16 tmp[16];
        for (int k = 0; k < 16; ++k) tmp[k] = rec.luma_ac8[i8][4 * k + b];
        int nC = ctx.nC_luma(r);
        cavlc_write_residual(bw, nC, 16, tmp);
        ctx.cur.nnz[r] = rec.nnz[r];
      }
    } else {
      for (int b = 0; b < 4; ++b) {
        int d = i8 * 4 + b;
        int r = kBlk4x4DecodeOrder[d];
        int nC = ctx.nC_luma(r);
        if (is_i16) {
          cavlc_write_residual(bw, nC, 15, &rec.luma_ac[r][1]);
        } else {
          cavlc_write_residual(bw, nC, 16, rec.luma_ac[r]);
        }
        ctx.cur.nnz[r] = rec.nnz[r];
      }
    }
  }
  if (rec.cbp_chroma != 0) {
    for (int c = 0; c < 2; ++c) {
      cavlc_write_residual(bw, -1, 4, rec.chroma_dc[c]);
    }
  }
  if (rec.cbp_chroma == 2) {
    for (int c = 0; c < 2; ++c) {
      for (int b = 0; b < 4; ++b) {
        int nC = ctx.nC_chroma(c, b);
        cavlc_write_residual(bw, nC, 15, &rec.chroma_ac[c * 4 + b][1]);
        ctx.cur.nnz[16 + c * 4 + b] = rec.nnz[16 + c * 4 + b];
      }
    }
  }
}

// Parse intra prediction info (mb_pred for intra MBs).
static void parse_intra_pred(BitReader& br, SliceCtx& ctx, MbRecord& rec) {
  size_t p0 = br.pos_bits();
  auto bill = [&](int tag) {
    if (ctx.bench) {
      size_t p = br.pos_bits();
      ctx.bench[tag] += double(p - p0);
      p0 = p;
    }
  };
  if (rec.mb_class == MB_I4x4) {
    for (int d = 0; d < 16; ++d) {
      int r = kBlk4x4DecodeOrder[d];
      int pred = ctx.pred_intra_4x4_mode(r);
      int mode;
      if (br.bit()) {  // prev_intra4x4_pred_mode_flag
        mode = pred;
      } else {
        int rem = br.u(3);
        mode = rem < pred ? rem : rem + 1;
      }
      rec.i4_modes[d] = u8(mode);
      ctx.cur.i4_modes[r] = i8(mode);  // later blocks predict from this
    }
    bill(BILL_I4_MODE);
  } else if (rec.mb_class == MB_I8x8) {
    static const int kTopLeft[4] = {0, 2, 8, 10};
    for (int b = 0; b < 4; ++b) {
      int pred = ctx.pred_intra_8x8_mode(b);
      int mode;
      if (br.bit()) {
        mode = pred;
      } else {
        int rem = br.u(3);
        mode = rem < pred ? rem : rem + 1;
      }
      rec.i4_modes[b] = u8(mode);
      int tl = kTopLeft[b];
      ctx.cur.i4_modes[tl] = ctx.cur.i4_modes[tl + 1] = i8(mode);
      ctx.cur.i4_modes[tl + 4] = ctx.cur.i4_modes[tl + 5] = i8(mode);
    }
    bill(BILL_I8_MODE);
  }
  if (ctx.sps->chroma_format_idc != 0) {
    rec.chroma_mode = u8(br.ue());
    PIP_CHECK(rec.chroma_mode <= 3, "bad chroma pred mode");
    bill(BILL_CHROMA_MODE);
  }
}

static void write_intra_pred(BitWriter& bw, SliceCtx& ctx, const MbRecord& rec) {
  if (rec.mb_class == MB_I4x4) {
    for (int d = 0; d < 16; ++d) {
      int r = kBlk4x4DecodeOrder[d];
      int pred = ctx.pred_intra_4x4_mode(r);
      int mode = rec.i4_modes[d];
      if (mode == pred) {
        bw.put_bit(1);
      } else {
        bw.put_bit(0);
        bw.put(u32(mode < pred ? mode : mode - 1), 3);
      }
      ctx.cur.i4_modes[r] = i8(mode);
    }
  } else if (rec.mb_class == MB_I8x8) {
    static const int kTopLeft[4] = {0, 2, 8, 10};
    for (int b = 0; b < 4; ++b) {
      int pred = ctx.pred_intra_8x8_mode(b);
      int mode = rec.i4_modes[b];
      if (mode == pred) {
        bw.put_bit(1);
      } else {
        bw.put_bit(0);
        bw.put(u32(mode < pred ? mode : mode - 1), 3);
      }
      int tl = kTopLeft[b];
      ctx.cur.i4_modes[tl] = ctx.cur.i4_modes[tl + 1] = i8(mode);
      ctx.cur.i4_modes[tl + 4] = ctx.cur.i4_modes[tl + 5] = i8(mode);
    }
  }
  if (ctx.sps->chroma_format_idc != 0) {
    bw.put_ue(rec.chroma_mode);
  }
}

// number of mvd pairs per sub_mb_type
static const int kSubMvCount[4] = {1, 2, 2, 4};

static void parse_inter_pred(BitReader& br, SliceCtx& ctx, MbRecord& rec) {
  int num_ref = ctx.sh->num_ref_idx_l0_active;
  size_t p0 = br.pos_bits();
  auto bill = [&](int tag) {
    if (ctx.bench) {
      size_t p = br.pos_bits();
      ctx.bench[tag] += double(p - p0);
      p0 = p;
    }
  };
  auto read_ref = [&]() -> i8 {
    if (num_ref <= 1) return 0;
    i8 r = i8(br.te(num_ref - 1));
    bill(BILL_REF);
    return r;
  };
  auto read_mvd = [&](int slot) {
    bool sub = rec.mb_class != MB_P16x16;   // bench MVD-by-partition
    rec.mvd[slot][0] = i16(br.se());
    bill(sub ? BILL_MVD_SUB_X : BILL_MVD_X);
    rec.mvd[slot][1] = i16(br.se());
    bill(sub ? BILL_MVD_SUB_Y : BILL_MVD_Y);
  };
  switch (rec.mb_class) {
    case MB_P16x16:
      rec.ref_idx[0] = read_ref();
      read_mvd(0);
      break;
    case MB_P16x8:
    case MB_P8x16:
      for (int p = 0; p < 2; ++p) rec.ref_idx[p] = read_ref();
      for (int p = 0; p < 2; ++p) read_mvd(p);
      break;
    case MB_P8x8:
    case MB_P8x8REF0: {
      for (int i = 0; i < 4; ++i) {
        u32 st = br.ue();
        PIP_CHECK(st <= 3, "bad P sub_mb_type");
        rec.sub_types[i] = u8(st);
      }
      bill(BILL_SUB_MB);
      if (rec.mb_class == MB_P8x8) {
        for (int i = 0; i < 4; ++i) rec.ref_idx[i] = read_ref();
      }
      for (int i = 0; i < 4; ++i) {
        for (int j = 0; j < kSubMvCount[rec.sub_types[i]]; ++j) {
          read_mvd(4 * i + j);
        }
      }
      break;
    }
    default:
      throw PipError("parse_inter_pred: not an inter MB");
  }
}

static void write_inter_pred(BitWriter& bw, SliceCtx& ctx, const MbRecord& rec) {
  int num_ref = ctx.sh->num_ref_idx_l0_active;
  auto write_ref = [&](i8 v) {
    if (num_ref <= 1) return;
    bw.put_te(u32(v), num_ref - 1);
  };
  switch (rec.mb_class) {
    case MB_P16x16:
      write_ref(rec.ref_idx[0]);
      bw.put_se(rec.mvd[0][0]);
      bw.put_se(rec.mvd[0][1]);
      break;
    case MB_P16x8:
    case MB_P8x16:
      for (int p = 0; p < 2; ++p) write_ref(rec.ref_idx[p]);
      for (int p = 0; p < 2; ++p) {
        bw.put_se(rec.mvd[p][0]);
        bw.put_se(rec.mvd[p][1]);
      }
      break;
    case MB_P8x8:
    case MB_P8x8REF0: {
      for (int i = 0; i < 4; ++i) bw.put_ue(rec.sub_types[i]);
      if (rec.mb_class == MB_P8x8) {
        for (int i = 0; i < 4; ++i) write_ref(rec.ref_idx[i]);
      }
      for (int i = 0; i < 4; ++i) {
        for (int j = 0; j < kSubMvCount[rec.sub_types[i]]; ++j) {
          bw.put_se(rec.mvd[4 * i + j][0]);
          bw.put_se(rec.mvd[4 * i + j][1]);
        }
      }
      break;
    }
    default:
      throw PipError("write_inter_pred: not an inter MB");
  }
}

// Whether transform_size_8x8_flag is parsed after CBP for this inter MB
// (spec 7.3.5 condition; no B slices here).
static bool inter_has_8x8_flag(const SliceCtx& ctx, const MbRecord& rec) {
  if (!ctx.pps->transform_8x8_mode) return false;
  if (rec.cbp_luma == 0) return false;
  if (rec.mb_class == MB_P8x8 || rec.mb_class == MB_P8x8REF0) {
    for (int i = 0; i < 4; ++i)
      if (rec.sub_types[i] != SUB_8x8) return false;
  }
  return true;
}

void parse_mb_cavlc(BitReader& br, SliceCtx& ctx, MbRecord& rec) {
  bool isP = ctx.sh->slice_type == SLICE_P || ctx.sh->slice_type == SLICE_SP;
  size_t p0 = br.pos_bits();
  auto bill = [&](int tag) {
    if (ctx.bench) {
      size_t p = br.pos_bits();
      ctx.bench[tag] += double(p - p0);
      p0 = p;
    }
  };
  u32 mb_type = br.ue();
  bill(BILL_MB_TYPE);
  int intra_type = -1;
  if (isP) {
    if (mb_type < 5) {
      static const u8 kPClass[5] = {MB_P16x16, MB_P16x8, MB_P8x16, MB_P8x8,
                                    MB_P8x8REF0};
      rec.mb_class = kPClass[mb_type];
    } else {
      intra_type = int(mb_type) - 5;
    }
  } else {
    intra_type = int(mb_type);
  }
  if (intra_type >= 0) {
    PIP_CHECK(intra_type <= 25, "bad intra mb_type");
    if (intra_type == 0) {
      rec.mb_class = MB_I4x4;
      if (ctx.pps->transform_8x8_mode) {
        rec.transform_8x8 = br.bit();
        bill(BILL_T8X8);
        if (rec.transform_8x8) rec.mb_class = MB_I8x8;
      }
    } else if (intra_type == 25) {
      rec.mb_class = MB_PCM;
      // pcm_alignment_zero_bit
      while (!br.byte_aligned()) {
        PIP_CHECK(br.bit() == 0, "nonzero pcm alignment bit");
      }
      int n = 256 + (ctx.sps->chroma_format_idc == 1 ? 128 : 0);
      PIP_CHECK(n == 384, "only 4:2:0 PCM supported");
      for (int i = 0; i < 384; ++i) rec.pcm[i] = u8(br.u(8));
      bill(BILL_PCM);
      return;  // PCM has no further syntax
    } else {
      rec.mb_class = MB_I16x16;
      int t = intra_type - 1;
      rec.i16_mode = u8(t & 3);
      rec.cbp_chroma = u8((t >> 2) % 3);
      rec.cbp_luma = (t >= 12) ? 15 : 0;
    }
  }
  // mb_pred
  if (mb_is_intra(rec.mb_class)) {
    parse_intra_pred(br, ctx, rec);
  } else {
    parse_inter_pred(br, ctx, rec);
  }
  // coded_block_pattern
  if (rec.mb_class != MB_I16x16) {
    p0 = br.pos_bits();
    u32 code = br.ue();
    bill(BILL_CBP);
    bool mono = ctx.sps->chroma_format_idc == 0;
    bool intra = mb_is_intra(rec.mb_class);
    const u8* t = mono ? (intra ? kCbpIntra400 : kCbpInter400)
                       : (intra ? kCbpIntra : kCbpInter);
    PIP_CHECK(code < u32(mono ? 16 : 48), "cbp code out of range");
    u32 cbp = t[code];
    rec.cbp_luma = u8(cbp & 15);
    rec.cbp_chroma = u8(cbp >> 4);
    if (mb_is_inter(rec.mb_class) && inter_has_8x8_flag(ctx, rec)) {
      rec.transform_8x8 = br.bit();
      bill(BILL_T8X8);
    }
  }
  // mb_qp_delta (the QP chain itself is advanced by the engine AFTER the
  // model symbols are coded, so model contexts see pre-MB state on both
  // the compress and recode sides)
  if (rec.cbp_luma != 0 || rec.cbp_chroma != 0 || rec.mb_class == MB_I16x16) {
    p0 = br.pos_bits();
    rec.dqp = i8(br.se());
    bill(BILL_QP);
    parse_residuals(br, ctx, rec);
  }
}

void write_mb_cavlc(BitWriter& bw, SliceCtx& ctx, const MbRecord& rec) {
  bool isP = ctx.sh->slice_type == SLICE_P || ctx.sh->slice_type == SLICE_SP;
  // mb_type
  int intra_type = -1;
  switch (rec.mb_class) {
    case MB_P16x16: bw.put_ue(0); break;
    case MB_P16x8: bw.put_ue(1); break;
    case MB_P8x16: bw.put_ue(2); break;
    case MB_P8x8: bw.put_ue(3); break;
    case MB_P8x8REF0: bw.put_ue(4); break;
    case MB_I4x4:
    case MB_I8x8: intra_type = 0; break;
    case MB_PCM: intra_type = 25; break;
    case MB_I16x16:
      intra_type = 1 + rec.i16_mode + 4 * (rec.cbp_chroma + (rec.cbp_luma ? 3 : 0));
      break;
    default:
      throw PipError("write_mb_cavlc: bad class");
  }
  if (intra_type >= 0) bw.put_ue(u32(intra_type) + (isP ? 5 : 0));
  if (rec.mb_class == MB_PCM) {
    while (!bw.byte_aligned()) bw.put_bit(0);
    for (int i = 0; i < 384; ++i) bw.put(rec.pcm[i], 8);
    return;
  }
  if (rec.mb_class == MB_I4x4 || rec.mb_class == MB_I8x8) {
    if (ctx.pps->transform_8x8_mode) bw.put_bit(rec.mb_class == MB_I8x8);
  }
  if (mb_is_intra(rec.mb_class)) {
    write_intra_pred(bw, ctx, rec);
  } else {
    write_inter_pred(bw, ctx, rec);
  }
  if (rec.mb_class != MB_I16x16) {
    bool mono = ctx.sps->chroma_format_idc == 0;
    bool intra = mb_is_intra(rec.mb_class);
    int cbp = rec.cbp_luma | (rec.cbp_chroma << 4);
    bw.put_ue(u32(cbp_to_code(cbp, intra, mono)));
    if (mb_is_inter(rec.mb_class) && inter_has_8x8_flag(ctx, rec)) {
      bw.put_bit(rec.transform_8x8);
    }
  }
  if (rec.cbp_luma != 0 || rec.cbp_chroma != 0 || rec.mb_class == MB_I16x16) {
    bw.put_se(rec.dqp);
    write_residuals(bw, ctx, rec);
  }
}

}  // namespace h264pip
