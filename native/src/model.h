// The recompression context model: adaptive priors over every macroblock
// symbol, conditioned on spatial neighbors (LEFT/ABOVE) and the co-located
// macroblock of the previous frame (PAST).
//
// Reference parity: macroblock_model.{h,cpp} + the serializer order in
// WelsDecodeSliceForNonRecoding (decode_slice.cpp:2174-2474). Clean-room
// redesign: identical conditioning ideas (PAST/left/above nonzero counts,
// positional AC contexts, QP-delta swizzle, preferred-value coding of
// pred modes), but compact tables, a single arithmetic stream, and one
// templated emit/scan body so compress and recode cannot diverge.
#pragma once

#include "arith.h"
#include "engine.h"  // BillTag
#include "state.h"
#include "tables.h"

namespace h264pip {

// ---------------------------------------------------------------------------
// FreqImage: model-side double-buffered per-MB record store (reference:
// decoded_macroblock.h:106-191, function-local static in decode_slice.cpp).
// Here it is explicit, per-engine state — shardable.
// ---------------------------------------------------------------------------
struct FreqImage {
  int w = 0, h = 0;
  bool prior_valid = false;
  std::vector<MbRecord> cur, prev;
  std::vector<u8> cur_init, prev_init;
  std::vector<u16> prev_skip_run;  // consecutive-skip run length at each MB

  void reset(int width, int height) {
    w = width;
    h = height;
    size_t n = size_t(w) * h;
    cur.assign(n, MbRecord());
    prev.assign(n, MbRecord());
    cur_init.assign(n, 0);
    prev_init.assign(n, 0);
    prev_skip_run.assign(n, 0);
    prior_valid = false;
  }

  void advance_frame() {
    std::swap(cur, prev);
    std::swap(cur_init, prev_init);
    size_t n = cur.size();
    std::fill(cur_init.begin(), cur_init.end(), u8(0));
    prev_skip_run.assign(n, 0);
    int run = 0;
    for (int i = int(n) - 1; i >= 0; --i) {
      run = (prev_init[i] && prev[i].mb_class == MB_PSKIP) ? run + 1 : 0;
      prev_skip_run[i] = u16(std::min(run, 65535));
    }
    prior_valid = true;
  }

  const MbRecord* at(int x, int y) const {
    if (x < 0 || y < 0 || x >= w || y >= h) return nullptr;
    size_t i = size_t(y) * w + x;
    return cur_init[i] ? &cur[i] : nullptr;
  }
  const MbRecord* past_at(int x, int y) const {
    if (!prior_valid || x < 0 || y < 0 || x >= w || y >= h) return nullptr;
    size_t i = size_t(y) * w + x;
    return prev_init[i] ? &prev[i] : nullptr;
  }
  int past_skip_run(int x, int y) const {
    if (!prior_valid || x < 0 || y < 0 || x >= w || y >= h) return 0;
    return prev_skip_run[size_t(y) * w + x];
  }
  void store(int x, int y, const MbRecord& r) {
    size_t i = size_t(y) * w + x;
    cur[i] = r;
    cur_init[i] = 1;
  }
};

// ---------------------------------------------------------------------------
// Prior type aliases (parameters follow the reference's proven choices:
// MVD UEGk with order 3 — quarter-pel phase bits; AC UEGk(14,...)).
// ---------------------------------------------------------------------------
using SkipRunPrior = IntPriorT<12, 8, 0>;
using DcPrior = IntPriorT<8, 8, 0>;
using NzPrior = IntPriorT<6, 8, 0>;
using AcPrior = UEGkPriorT<14, 4, 6, 4, 0>;
using MvdPrior = UEGkPriorT<9, 4, 6, 8, 3>;

// Dedicated AC magnitude prior (the tibbycabac magnitude column):
// few, heavily-trained contexts in the CABAC abs-level style instead
// of magnitude stats diluted across the ~100k-context AcPrior table
// (each of which sees only a handful of coefficients and never
// adapts). Reference: coeff_abs_level_minus1 ctxIdxInc from
// (numDecodAbsLevelEq1, numDecodAbsLevelGt1),
// parse_mb_syn_cabac.cpp:846-975.
struct MagPrior {
  UnaryPrior<8> first;     // unary part up to the UEGk threshold
  IntPriorT<6, 4, 0> tail;
};

// Context-mixing parent weight (bit_mix pseudo-count): swept 6..64 on
// the tuning corpus; small K wins overall (rich contexts take over
// quickly) while the n>=96 confidence gate protects long streams.
constexpr u32 MIX_K = 8;

inline int cls_bucket(u8 c) {  // 0 intra4/8, 1 I16, 2 inter, 3 skip/pcm
  switch (c) {
    case MB_I4x4:
    case MB_I8x8: return 0;
    case MB_I16x16: return 1;
    case MB_PCM: return 3;
    case MB_PSKIP: return 3;
    default: return 2;
  }
}

struct Model {
  BranchPrior<4> mb_type[31][2];  // [left-else-above class + past class]
                                  // (full 2D left x past and bucketed
                                  // left x above x past were both measured
                                  // WORSE — the sum shares statistics)
  // (A 2D [left][past] fine context LAYERED over the summed context via
  // count-weighted mixing was also measured WORSE, corpus -166 B —
  // the sum genuinely shares statistics better here.)
  SkipRunPrior skip_run[65];
  DynProb end_bit[2048];
  DynProb end_bit_skip[2048];
  BranchPrior<2> cbp_c[4][9][MB_NUM_CLASSES];   // [past][left*3+above exact]
  // cbp_luma per-8x8-bit: [bit][left bit][above bit][past bit 0/1/2=none][cls]
  DynProb cbp_lbit[4][2][2][3][MB_NUM_CLASSES];
  DynProb qp_delta[2][3][2][128];  // [isFirst][sign(lastDelta)+1]
                                   // [above-QP pref active] zero+tree<7>
                                // (5-bucket lastDelta and past-|dqp|
                                // contexts were both measured a wash)
  DynProb i16_mode[8][8];       // [past-pref] zero+tree<3>
  DynProb chroma_mode[8][8];
  BranchPrior<4> pred_mode[2][8][9][10];  // [is8x8][availIdx][min(A,B)]
                                          // [max(A,B), 9=unavail] — the full
                                          // neighbor-mode pair, not just the
                                          // 8.3.1.1 min() the bitstream uses —
                                          // (a PAST co-located-mode dim was
                                          // measured WORSE: P-frame intra MBs
                                          // rarely co-locate with past intra)
  BranchPrior<2> sub_mb[4];           // [position]
  UnaryPrior<4> ref_idx[3][4][4];     // [past refidx clamp 2]
                                      // [left/above ref>0 pair][partition]
  MvdPrior mvd[4][16][2][3][3];       // [class bucket][slot][xy][past-mvd
                                      //  magnitude bucket 0/small/large]
                                      // [max(left,above) same-component
                                      //  mvd magnitude bucket]
  DynProb t8x8_flag[MB_NUM_CLASSES][64];
  DcPrior luma_dc[16][3];  // [coef idx][past-dc bucket: 0,|1|,>1]
  DcPrior chroma_dc[8][3];
  NzPrior nz_4x4[3][3][5][5][5];  // [color][clsb(<=2)][past][left][above]
  NzPrior nz_8x8[5][5][5];        // [past][left][above]
  // [color][intra][scan][nzleft][prev][ctx2]; ctx2 = (pastmag*4 + runb)
  // + 12*gt1seen — gt1seen (any |coeff| > 1 coded so far in the block)
  // is the CABAC c2-analog block-energy cue the magnitude coder needs
  // to stop overpaying on large-level blocks (tibbycabac mag column)
  AcPrior ac_4x4[3][2][16][12][5][24];
                                      // [pastnz*2 + (prev2 != 0)]
                                      // (a 0/|1|/>=2 past-magnitude bucket
                                      // was measured WORSE: QP changes
                                      // make past magnitudes misleading;
                                      // a summed left+above nz-bucket
                                      // 4-way energy dim likewise WORSE
                                      // — context dilution on short
                                      // streams)
  AcPrior ac_8x8[32][12][5][24];        // [scan>>2][nzleft][prev][same]
  // [chroma][intra][abs-level state: gt1 ? 4+min(2,gt1-1) : min(3,eq1)]
  // [previous coefficient |v| bucket (prevb)] — a co-located-past
  // magnitude dim was measured WORSE (adaptive-QP streams, BAMQ2:
  // QP changes make past magnitudes misleading)
  MagPrior ac_mag[2][2][7][5][4][4];  // + nzleft bucket (block energy)
                                      // + co-located past |coeff| bucket
  // coarse parents for count-weighted context mixing (bit_mix): the
  // rich ac_4x4/ac_8x8 zero/gt1 probs see few samples each on short
  // streams; blending with these heavily-trained parents stops the
  // dilution (VERDICT r4 lever: mixing/backoff across contexts)
  DynProb ac_zero_c[3][2][16][12];
  DynProb ac_zero_c8[32][12];
  DynProb ac_gt1_c[2][2][7];
  DynProb ac_sign_c[4][2][2];  // coarse sign parent [cue][chroma][intra]
  SkipRunPrior skip_run_c;     // coarse parent of skip_run
  DcPrior luma_dc_c[3];        // coarse parent of luma_dc [pastb]
  DcPrior chroma_dc_c[3];      // coarse parent of chroma_dc [pastb]
  DynProb t8x8_c[64];          // coarse parent of t8x8_flag [qp&63]
  BranchPrior<4> mb_type_c[2]; // coarse parent of mb_type [slice_is_p]
  BranchPrior<2> cbp_c_c[MB_NUM_CLASSES];  // coarse parent of cbp_c
  DynProb qp_delta_c[128];     // coarse parent of qp_delta
  DynProb i16_mode_c[8];       // coarse parent of i16_mode
  DynProb chroma_mode_c[8];    // coarse parent of chroma_mode
  DynProb end_bit_c[2048];     // coarse parent of end_bit(+skip)
  UnaryPrior<4> ref_idx_c;     // coarse parent of ref_idx
  MagPrior ac_mag_c[2];        // grandparent of the magnitude rest/tail
                               // [chroma] — the rest-unary sees only
                               // |v|>=2 coeffs, 1-2 samples per rich
                               // prob on CIF-length streams
  NzPrior nz_c[3];        // coarse parent of nz_4x4 (per color)
  NzPrior nz_c8;          // coarse parent of nz_8x8
  MvdPrior mvd_c[2];      // coarse parent of mvd (per component)
  BranchPrior<4> pred_mode_c[2];  // coarse parent of pred_mode (is8x8)
  DynProb cbp_lbit_c[4];  // coarse parent of cbp_luma bits (per bit)
  BranchPrior<8> pcm_byte[3];         // [plane]

  Model() = default;
};

// ---------------------------------------------------------------------------
// Model context for one MB. `rec` points at the record being emitted
// (writer: fully populated) or filled (reader: populated as symbols are
// scanned — earlier fields are valid context for later symbols).
// ---------------------------------------------------------------------------
struct ModelCtx {
  Model* M = nullptr;
  FreqImage* fi = nullptr;
  SliceCtx* sc = nullptr;  // bitstream-state (kept in sync on both sides)
  int mbx = 0, mby = 0;
  int slice_is_p = 0;
  int mb_index_in_slice = 0;
  const MbRecord* past = nullptr;
  const MbRecord* left = nullptr;
  const MbRecord* above = nullptr;
  MbRecord* rec = nullptr;

  void at(int x, int y, int index_in_slice, MbRecord* r) {
    mbx = x;
    mby = y;
    mb_index_in_slice = index_in_slice;
    past = fi->past_at(x, y);
    left = fi->at(x - 1, y);
    above = fi->at(x, y - 1);
    rec = r;
  }
};

// Zero-or-tree coding of a value in [0, 2^N] with a preferred value
// (reference: emitBitsZeroToPow2Inclusive, compression_stream.h:455-463).
// p points at 1 + (2^N - 1) DynProbs.
template <class IO, int N>
inline u32 code_zero_pow2(IO& io, u32 val, DynProb* p, u32 preferred,
                          DynProb* parent = nullptr) {
  bool nz = parent ? io.bit_mix(val != preferred, &p[0], &parent[0], MIX_K)
                   : io.bit(val != preferred, &p[0]);
  if (!nz) return preferred;
  u32 x = 0;
  if (IO::kIsWriter) x = val > preferred ? val - 1 : val;
  u32 out = 0;
  int node = 0;
  for (int d = N - 1; d >= 0; --d) {
    bool b = parent ? io.bit_mix((x >> d) & 1, &p[1 + node],
                                 &parent[1 + node], MIX_K)
                    : io.bit((x >> d) & 1, &p[1 + node]);
    out = (out << 1) | u32(b);
    node = 2 * node + 1 + (b ? 1 : 0);
  }
  return out + (out >= preferred ? 1 : 0);
}

// per-block model nonzero counts at sub-4x4 granularity (rec.nnz layout)
inline int rec_block_nnz(const MbRecord* r, int color, int blk) {
  if (!r) return 0;
  if (color == 0) return r->nnz[blk];
  return r->nnz[16 + (color - 1) * 4 + blk];
}
inline int rec_block8_nnz(const MbRecord* r, int blk8) {
  if (!r) return 0;
  static const int kTopLeft[4] = {0, 2, 8, 10};
  int tl = kTopLeft[blk8];
  return r->nnz[tl] + r->nnz[tl + 1] + r->nnz[tl + 4] + r->nnz[tl + 5];
}

// ---------------------------------------------------------------------------
// AC/DC block codec. `coeff` spans scan positions [start, start+n).
// blk: luma raster 0..15 (4x4) / 8x8 block 0..3 / chroma raster 0..3.
// On the reader side, fills coeff and rec->nnz for the block.
// ---------------------------------------------------------------------------
template <class IO, bool IS8x8>
void code_block(IO& io, ModelCtx& mc, int color, int blk, i16* coeff,
                int start, int n) {
  Model& M = *mc.M;
  MbRecord* rec = mc.rec;
  int pastc, leftc, abovec;
  // count buckets: 0,1,2,3-5,6+ (finer than a flat clamp-3)
  auto nzb = [](int c) { return c >= 6 ? 4 : (c >= 3 ? 3 : c); };  // 6 buckets measured WORSE
  if (IS8x8) {
    int bx = blk & 1, by = blk >> 1;
    pastc = nzb(rec_block8_nnz(mc.past, blk));
    leftc = nzb(bx > 0 ? rec_block8_nnz(rec, blk - 1)
                    : rec_block8_nnz(mc.left, blk + 1));
    abovec = nzb(by > 0 ? rec_block8_nnz(rec, blk - 2)
                     : rec_block8_nnz(mc.above, blk + 2));
  } else if (color == 0) {
    int bx = blk & 3, by = blk >> 2;
    pastc = nzb(rec_block_nnz(mc.past, 0, blk));
    leftc = nzb(bx > 0 ? rec_block_nnz(rec, 0, blk - 1)
                    : rec_block_nnz(mc.left, 0, by * 4 + 3));
    abovec = nzb(by > 0 ? rec_block_nnz(rec, 0, blk - 4)
                     : rec_block_nnz(mc.above, 0, 12 + bx));
  } else {
    int bx = blk & 1, by = blk >> 1;
    pastc = nzb(rec_block_nnz(mc.past, color, blk));
    leftc = nzb(bx > 0 ? rec_block_nnz(rec, color, blk - 1)
                    : rec_block_nnz(mc.left, color, by * 2 + 1));
    abovec = nzb(by > 0 ? rec_block_nnz(rec, color, blk - 2)
                     : rec_block_nnz(mc.above, color, 2 + bx));
  }
  io.set_tag(color == 0 ? BILL_LUMA_NZ : BILL_CHROMA_NZ);
  int nonzeros = 0;
  if (IO::kIsWriter) {
    for (int i = 0; i < n; ++i)
      if (coeff[start + i]) ++nonzeros;
  }
  NzPrior* nzp;
  if (IS8x8) {
    nzp = &M.nz_8x8[pastc][leftc][abovec];
  } else {
    int cb = std::min(2, cls_bucket(rec->mb_class));
    nzp = &M.nz_4x4[color][cb][pastc][leftc][abovec];
  }
  // cbp constraint: the coded_block_pattern bit promised a nonzero
  // somewhere in its group; when this is the group's last block and
  // every earlier one was zero, nz >= 1 is implied — skip the zero
  // flag. (An encoder could legally emit a set cbp bit over an
  // all-zero group, coeff_token == 0; such a slice trips the writer's
  // |val| >= 1 check and takes the raw-fallback path, so losslessness
  // holds and only that slice's ratio is lost.)
  bool force_nz = false;
  if (IS8x8) {
    force_nz = true;  // the bit covers exactly this one 8x8 block
  } else if (color == 0) {
    int fx = blk & 3, fy = blk >> 2;
    if ((fx & 1) && (fy & 1)) {
      int tl = blk - 5;
      bool prev0 = rec->nnz[tl] == 0 && rec->nnz[tl + 1] == 0 &&
                   rec->nnz[tl + 4] == 0;
      if (rec->mb_class == MB_I16x16) {
        if (blk == 15 && prev0) {
          force_nz = true;
          for (int b = 0; b < 15; ++b)
            if (rec->nnz[b]) { force_nz = false; break; }
        }
      } else {
        force_nz = prev0;
      }
    }
  } else if (color == 2 && blk == 3) {
    force_nz = true;
    for (int k = 16; k < 23; ++k)
      if (rec->nnz[k]) { force_nz = false; break; }
  }
  NzPrior* nzc = IS8x8 ? &M.nz_c8 : &M.nz_c[color];
  nonzeros = code_int_mix(io, nonzeros, nzp, nzc, MIX_K,
                          /*hasZero=*/!force_nz,
                          /*hasSign=*/false);
  PIP_CHECK(nonzeros >= 0 && nonzeros <= n, "block nonzeros out of range");

  io.set_tag(color == 0 ? BILL_LUMA_AC : BILL_CHROMA_AC);
  bool intra = mb_is_intra(rec->mb_class);
  int nzleft = nonzeros;
  i32 prev = 0, prev2 = 0;
  int runz = 0;  // consecutive zeros immediately before position i
  int gt1seen = 0;  // any |coeff| > 1 coded so far (CABAC c2 analog)
  int eq1 = 0;      // |coeff| == 1 count so far (abs-level state)
  int gt1cnt = 0;   // |coeff| > 1 count so far
  const MbRecord* past = mc.past;
  // Forward scan with early stop: positions after the last nonzero are
  // implied zero. (Measured BETTER than the reference's reverse-zigzag
  // walk, decode_slice.cpp kzz16 — reverse pays explicit zero symbols
  // for the whole high-frequency tail; forward stops at the last
  // nonzero, and the nzleft context recovers the magnitude cue.)
  for (int i = 0; i < n && nzleft > 0; ++i) {
    int pastmag = 2;  // no-past bucket (pastmag*4 + runb must stay < 12:
                      // gt1seen selects the upper half of the [24] ctx2 dim)
    int pabs = -1;    // co-located past |value| (-1 = no past)
    int flip = 1;
    bool flip_cue = false;
    bool nbr_cue = false;  // cue came from a spatial neighbor block
    if (past) {
      i16 pv = 0;
      if (IS8x8) {
        pv = past->transform_8x8 ? past->luma_ac8[blk][start + i] : i16(0);
      } else if (color == 0) {
        pv = past->transform_8x8 ? i16(0) : past->luma_ac[blk][start + i];
      } else {
        pv = past->chroma_ac[(color - 1) * 4 + blk][start + i];
      }
      pastmag = pv ? 1 : 0;
      pabs = pv < 0 ? -pv : pv;
      // sign coherence with the co-located PAST coefficient: code the
      // value sign-flipped by the past sign so the adaptive sign prob
      // learns the correlation (static gradients keep DCT signs)
      if (pv < 0) flip = -1;
      flip_cue = pastmag == 1;
    }
    if ((!past || pastmag == 0) && !IS8x8) {
      // no temporal prior (I frames / first frame): fall back to the
      // LEFT neighbor block's same-position sign (spatial gradient
      // continuity across the block edge)
      const MbRecord* ln = nullptr;
      int lblk = -1;
      if (color == 0) {
        int bx = blk & 3, by = blk >> 2;
        if (bx > 0) { ln = rec; lblk = blk - 1; }
        else if (mc.left && !mc.left->transform_8x8) {
          ln = mc.left; lblk = by * 4 + 3;
        }
        i16 lv = ln ? ln->luma_ac[lblk][start + i] : i16(0);
        if (lv == 0) {
          // tertiary cue: ABOVE neighbor block, same position
          const MbRecord* an = nullptr;
          int ablk = -1;
          if (by > 0) { an = rec; ablk = blk - 4; }
          else if (mc.above && !mc.above->transform_8x8) {
            an = mc.above; ablk = 12 + bx;
          }
          if (an) lv = an->luma_ac[ablk][start + i];
        }
        if (lv != 0) {
          flip_cue = true;
          nbr_cue = true;
          if (lv < 0) flip = -1;
        }
      } else {
        int bx = blk & 1, by = blk >> 1;
        if (bx > 0) { ln = rec; lblk = blk - 1; }
        else if (mc.left) { ln = mc.left; lblk = by * 2 + 1; }
        if (ln) {
          i16 lv = ln->chroma_ac[(color - 1) * 4 + lblk][start + i];
          if (lv != 0) { flip_cue = true; nbr_cue = true; }
          if (lv < 0) flip = -1;
        }
      }
    }
    int cue_kind = flip_cue ? (nbr_cue ? 3 : 1) : 0;
    if (!flip_cue && prev != 0) {
      // last-resort WEAK cue: previous coefficient's sign in this block
      cue_kind = 2;
      if (prev < 0) flip = -1;
    }
    int a_ = std::abs(int(prev));
    int prevb = a_ >= 5 ? 4 : (a_ >= 3 ? 3 : a_);
    int runb = runz >= 3 ? 3 : runz;
    int ctx2 = pastmag * 4 + runb + 12 * gt1seen;
    AcPrior* ap;
    if (IS8x8) {
      ap = &M.ac_8x8[(start + i) >> 1][std::min(11, nzleft)][prevb][ctx2];
    } else {
      ap = &M.ac_4x4[color][intra ? 1 : 0][start + i][std::min(11, nzleft)]
                    [prevb][ctx2];
    }
    // when every remaining position must be nonzero (nzleft == n - i)
    // the zero bit is deterministic — skip it (both directions know).
    // All AC decisions bill at sub-tag resolution (zero/sign/magnitude).
    // Magnitude bits train the dedicated MagPrior table (CABAC
    // abs-level-style state), not the position-rich AcPrior — the
    // tibbycabac magnitude-column fix.
    int mstate = gt1cnt ? 4 + (gt1cnt > 3 ? 2 : gt1cnt - 1)
                        : (eq1 > 3 ? 3 : eq1);
    int nzb = nzleft >= 4 ? 3 : nzleft - 1;
    int posi = start + i;
    int pmb = posi >= 7 ? 3 : (posi >= 3 ? 2 : (posi >= 1 ? 1 : 0));
    MagPrior* mp =
        &M.ac_mag[color != 0][intra ? 1 : 0][mstate][prevb][nzb][pmb];
    MagPrior* mpc = &M.ac_mag_c[color != 0];
    int nzc = std::min(11, nzleft);
    DynProb* zero_c =
        IS8x8 ? &M.ac_zero_c8[(start + i) >> 1][nzc]
              : &M.ac_zero_c[color][intra ? 1 : 0][start + i][nzc];
    DynProb* gt1_c = &M.ac_gt1_c[color != 0][intra ? 1 : 0][mstate];
    DynProb* sign_c = &M.ac_sign_c[cue_kind][color != 0][intra ? 1 : 0];
    i32 c = code_ac_split(io,
                      IO::kIsWriter ? i32(coeff[start + i]) * flip : 0, ap,
                      mp,
                      /*hasZero=*/nzleft < n - i,
                      color == 0 ? BILL_LUMA_AC_SIGN : BILL_CHROMA_AC_SIGN,
                      color == 0 ? BILL_LUMA_AC_MAG : BILL_CHROMA_AC_MAG,
                      /*sign_cue=*/cue_kind, zero_c, gt1_c, MIX_K, sign_c,
                      mpc);
    // next position's EOB bit bills to the structural AC tag
    io.set_tag(color == 0 ? BILL_LUMA_AC : BILL_CHROMA_AC);
    c *= flip;
    if (!IO::kIsWriter) coeff[start + i] = i16(c);
    if (c != 0) --nzleft;
    if (c == 1 || c == -1) ++eq1;
    if (c > 1 || c < -1) { gt1seen = 1; ++gt1cnt; }
    prev2 = prev;
    prev = c;
    runz = c == 0 ? runz + 1 : 0;
  }
  PIP_CHECK(nzleft == 0, "block nonzeros mismatch");
  // update rec.nnz so later blocks see this block's counts
  if (IS8x8) {
    for (int b = 0; b < 4; ++b) {
      int cnt = 0;
      for (int k = 0; k < 16; ++k)
        if (coeff[4 * k + b]) ++cnt;
      int d = blk * 4 + b;
      rec->nnz[kBlk4x4DecodeOrder[d]] = u8(cnt);
    }
  } else {
    int cnt = 0;
    for (int i = 0; i < n; ++i)
      if (coeff[start + i]) ++cnt;
    if (color == 0)
      rec->nnz[blk] = u8(cnt);
    else
      rec->nnz[16 + (color - 1) * 4 + blk] = u8(cnt);
  }
}

// ---------------------------------------------------------------------------
// Whole-MB symbol codec (order mirrors the reference serializer).
// Reader side fills *mc.rec. ctx.cur / SliceCtx are NOT modified here —
// the engine applies the record to the bitstream state separately.
// ---------------------------------------------------------------------------
template <class IO>
void code_mb_symbols(IO& io, ModelCtx& mc) {
  Model& M = *mc.M;
  MbRecord& rec = *mc.rec;
  SliceCtx& sc = *mc.sc;

  // 1. mb class
  io.set_tag(BILL_MB_TYPE);
  int spatial = mc.left ? mc.left->mb_class
                        : (mc.above ? mc.above->mb_class : 15);
  int prior = spatial + (mc.past ? mc.past->mb_class : 15);
  u32 cls = code_branch_mix<IO, 4>(io, rec.mb_class,
                               &M.mb_type[prior][mc.slice_is_p],
                               &M.mb_type_c[mc.slice_is_p], MIX_K);
  if (!IO::kIsWriter) {
    PIP_CHECK(cls < MB_NUM_CLASSES && cls != 9 && cls != 10, "bad mb class");
    rec.mb_class = u8(cls);
  }
  if (rec.mb_class == MB_PSKIP) return;

  if (rec.mb_class == MB_PCM) {
    io.set_tag(BILL_PCM);
    for (int i = 0; i < 384; ++i) {
      int plane = i < 256 ? 0 : (i < 320 ? 1 : 2);
      u32 v = code_branch<IO, 8>(io, rec.pcm[i], &M.pcm_byte[plane]);
      if (!IO::kIsWriter) rec.pcm[i] = u8(v);
    }
    return;
  }

  // 2. CBP (I16 carries cbp in mb_type; model codes it uniformly)
  io.set_tag(BILL_CBP_CHROMA);
  {
    int pc = mc.past ? std::min(3, int(mc.past->cbp_chroma)) : 0;
    int spc = (mc.left ? std::min(2, int(mc.left->cbp_chroma)) : 0) * 3 +
              (mc.above ? std::min(2, int(mc.above->cbp_chroma)) : 0);
    u32 v = code_branch_mix<IO, 2>(io, rec.cbp_chroma,
                               &M.cbp_c[pc][spc][rec.mb_class],
                               &M.cbp_c_c[rec.mb_class], MIX_K);
    if (!IO::kIsWriter) {
      PIP_CHECK(v <= 2, "bad cbp_chroma");
      rec.cbp_chroma = u8(v);
    }
    // per-bit coding with true 8x8-adjacent context (CABAC 9.3.3.1.1.4
    // idea + PAST bit): bit b8's left/above neighbor is the adjacent 8x8
    // inside this MB or the facing half of the left/above MB
    io.set_tag(BILL_CBP_LUMA);
    u8 cbp = 0;
    for (int b8 = 0; b8 < 4; ++b8) {
      int lb = (b8 & 1) ? ((cbp >> (b8 - 1)) & 1)
                        : (mc.left ? (mc.left->cbp_luma >> (b8 + 1)) & 1 : 0);
      int ab = (b8 >> 1) ? ((cbp >> (b8 - 2)) & 1)
                         : (mc.above ? (mc.above->cbp_luma >> (b8 + 2)) & 1 : 0);
      int pb = mc.past ? (mc.past->cbp_luma >> b8) & 1 : 2;
      bool bit = io.bit_mix((rec.cbp_luma >> b8) & 1,
                        &M.cbp_lbit[b8][lb][ab][pb][rec.mb_class],
                        &M.cbp_lbit_c[b8], MIX_K);
      if (bit) cbp |= u8(1 << b8);
    }
    if (!IO::kIsWriter) rec.cbp_luma = cbp;
    if (rec.mb_class == MB_I16x16) {
      PIP_CHECK(rec.cbp_luma == 0 || rec.cbp_luma == 15, "bad I16 cbp_luma");
    }
  }

  // 3. transform_8x8 for inter MBs (I8x8 is implied by the class; the
  //    eligibility condition depends on sub types, coded below first for
  //    P8x8 -- so order: sub types, then flag, then the rest)
  io.set_tag(BILL_SUB_MB);
  if (rec.mb_class == MB_P8x8 || rec.mb_class == MB_P8x8REF0) {
    for (int i = 0; i < 4; ++i) {
      u32 v = code_branch<IO, 2>(io, rec.sub_types[i], &M.sub_mb[i]);
      if (!IO::kIsWriter) rec.sub_types[i] = u8(v);
    }
  }
  if (!IO::kIsWriter) rec.transform_8x8 = (rec.mb_class == MB_I8x8);
  {
    // inter 8x8 flag eligibility (mirrors cavlc.cc inter_has_8x8_flag)
    bool elig = sc.pps->transform_8x8_mode && mb_is_inter(rec.mb_class) &&
                rec.cbp_luma != 0;
    if (elig && (rec.mb_class == MB_P8x8 || rec.mb_class == MB_P8x8REF0)) {
      for (int i = 0; i < 4; ++i)
        if (rec.sub_types[i] != SUB_8x8) elig = false;
    }
    if (elig) {
      io.set_tag(BILL_T8X8);
      bool f = io.bit_mix(rec.transform_8x8,
                      &M.t8x8_flag[rec.mb_class][sc.cur_qp & 63],
                      &M.t8x8_c[sc.cur_qp & 63], MIX_K);
      if (!IO::kIsWriter) rec.transform_8x8 = f;
    }
  }

  // 4. QP delta (present iff residual syntax present)
  bool has_dqp =
      rec.cbp_luma != 0 || rec.cbp_chroma != 0 || rec.mb_class == MB_I16x16;
  if (has_dqp) {
    io.set_tag(BILL_QP);
    int is_first = mc.mb_index_in_slice == 0 ? 1 : 0;
    int sgn = sc.last_dqp < 0 ? 0 : (sc.last_dqp == 0 ? 1 : 2);
    // (predicting the co-located PAST MB's dqp as the preferred value was
    // measured WORSE — dqp sequences do not repeat frame to frame)
    // GOM/row rate control produces row-banded QP planes: when the
    // running predictor disagrees with the MB above, the most likely
    // delta is the one landing on the above MB's QP
    u32 pref = 0;
    if (mc.above) {
      int d = int(mc.above->qp) - sc.cur_qp;
      if (d > 25) d -= 52;
      if (d < -26) d += 52;
      if (d != 0) pref = swizzle_sign(i8(d));
    }
    u32 v = code_zero_pow2<IO, 7>(io, swizzle_sign(rec.dqp),
                                  M.qp_delta[is_first][sgn][pref != 0],
                                  pref, M.qp_delta_c);
    if (!IO::kIsWriter) rec.dqp = i8(unswizzle_sign(u16(v)));
  } else if (!IO::kIsWriter) {
    rec.dqp = 0;
  }

  // 5. intra modes
  io.set_tag(BILL_I16_MODE);
  if (rec.mb_class == MB_I16x16) {
    u32 pref = mc.past && mc.past->mb_class == MB_I16x16
                   ? std::min<u32>(6, mc.past->i16_mode)
               : mc.left && mc.left->mb_class == MB_I16x16
                   ? std::min<u32>(6, mc.left->i16_mode)
               : mc.above && mc.above->mb_class == MB_I16x16
                   ? std::min<u32>(6, mc.above->i16_mode)
                   : 7;
    u32 v = code_zero_pow2<IO, 3>(io, rec.i16_mode, M.i16_mode[pref],
                                  pref, M.i16_mode_c);
    if (!IO::kIsWriter) {
      PIP_CHECK(v <= 3, "bad i16 mode");
      rec.i16_mode = u8(v);
    }
  }
  io.set_tag(BILL_CHROMA_MODE);
  if (mb_is_intra(rec.mb_class) && sc.sps->chroma_format_idc != 0) {
    u32 pref = mc.past && mb_is_intra(mc.past->mb_class)
                   ? std::min<u32>(6, mc.past->chroma_mode)
               : mc.left && mb_is_intra(mc.left->mb_class)
                   ? std::min<u32>(6, mc.left->chroma_mode)
               : mc.above && mb_is_intra(mc.above->mb_class)
                   ? std::min<u32>(6, mc.above->chroma_mode)
                   : 7;
    u32 v = code_zero_pow2<IO, 3>(io, rec.chroma_mode,
                                  M.chroma_mode[pref], pref,
                                  M.chroma_mode_c);
    if (!IO::kIsWriter) {
      PIP_CHECK(v <= 3, "bad chroma mode");
      rec.chroma_mode = u8(v);
    }
  }
  io.set_tag(rec.mb_class == MB_I8x8 ? BILL_I8_MODE : BILL_I4_MODE);
  if (rec.mb_class == MB_I4x4) {
    for (int d = 0; d < 16; ++d) {
      int r = kBlk4x4DecodeOrder[d];
      int bx = r & 3, by = r >> 2;
      int ma, mb;
      sc.intra_4x4_ab(r, &ma, &mb);
      int pred = (ma < 0 || mb < 0) ? 2 : std::min(ma, mb);
      int second = (ma < 0 || mb < 0) ? 9 : std::max(ma, mb);
      int availL = bx > 0 || sc.left_avail();
      int availT = by > 0 || sc.above_avail();
      int availIdx = (availL << 2) | (availT << 1) |
                     ((bx > 0 && by > 0) || (bx > 0 && sc.above_avail()) ||
                              (by > 0 && sc.left_avail()) ||
                              sc.mb_avail(sc.addr_above_left())
                          ? 1
                          : 0);
      u32 v = code_branch_mix<IO, 4>(io, rec.i4_modes[d],
                                 &M.pred_mode[0][availIdx][pred][second],
                                 &M.pred_mode_c[0], MIX_K);
      if (!IO::kIsWriter) {
        PIP_CHECK(v <= 8, "bad i4 mode");
        rec.i4_modes[d] = u8(v);
      }
      // make the mode visible to the in-MB predictor for later blocks
      sc.cur.i4_modes[r] = i8(rec.i4_modes[d]);
    }
    // restore: engine will re-run apply/commit; clear working modes
  } else if (rec.mb_class == MB_I8x8) {
    static const int kTopLeft[4] = {0, 2, 8, 10};
    for (int b = 0; b < 4; ++b) {
      int ma, mb;
      sc.intra_8x8_ab(b, &ma, &mb);
      int pred = (ma < 0 || mb < 0) ? 2 : std::min(ma, mb);
      int second = (ma < 0 || mb < 0) ? 9 : std::max(ma, mb);
      u32 v = code_branch_mix<IO, 4>(io, rec.i4_modes[b],
                                 &M.pred_mode[1][(b & 1) | ((b >> 1) << 1)][pred]
                                             [second],
                                 &M.pred_mode_c[1], MIX_K);
      if (!IO::kIsWriter) {
        PIP_CHECK(v <= 8, "bad i8 mode");
        rec.i4_modes[b] = u8(v);
      }
      int tl = kTopLeft[b];
      i8 m = i8(rec.i4_modes[b]);
      sc.cur.i4_modes[tl] = sc.cur.i4_modes[tl + 1] = m;
      sc.cur.i4_modes[tl + 4] = sc.cur.i4_modes[tl + 5] = m;
    }
  }

  // 6. inter: ref idx + MVD
  if (mb_is_inter(rec.mb_class)) {
    int nparts = rec.mb_class == MB_P16x16 ? 1
                 : (rec.mb_class == MB_P16x8 || rec.mb_class == MB_P8x16) ? 2
                 : 4;
    int num_ref = sc.sh->num_ref_idx_l0_active;
    io.set_tag(BILL_REF);
    if (num_ref > 1 && rec.mb_class != MB_P8x8REF0) {
      auto nref = [](const MbRecord* n) {
        return n && mb_is_inter(n->mb_class) && n->ref_idx[0] > 0 ? 1 : 0;
      };
      int spr = nref(mc.left) + 2 * nref(mc.above);
      for (int p = 0; p < nparts; ++p) {
        int pastref = mc.past ? std::max(0, std::min(2, int(mc.past->ref_idx[p])))
                              : 0;
        int v = code_unary_mix(io, IO::kIsWriter ? rec.ref_idx[p] : 0,
                           &M.ref_idx[pastref][spr][p], &M.ref_idx_c, MIX_K,
                           num_ref - 1);
        if (!IO::kIsWriter) rec.ref_idx[p] = i8(v);
      }
    }
    int cb = cls_bucket(rec.mb_class);
    // spatial motion-residual coherence: neighbor MBs with large MVDs
    // (median predictor misses) cluster around moving-object boundaries
    auto nbr_mvd_bucket = [](const MbRecord* n, int xy) -> int {
      if (!n || !mb_is_inter(n->mb_class)) return 0;
      int a = std::abs(int(n->mvd[0][xy]));
      return a == 0 ? 0 : (a <= 3 ? 1 : 2);
    };
    auto code_mv = [&](int slot) {
      bool subp = rec.mb_class != MB_P16x16;  // ours MVD-by-partition
      for (int xy = 0; xy < 2; ++xy) {
        io.set_tag(subp ? (xy == 0 ? BILL_MVD_SUB_X : BILL_MVD_SUB_Y)
                        : (xy == 0 ? BILL_MVD_X : BILL_MVD_Y));
        // temporal motion-coherence context: the co-located (PAST) MB's
        // MVD magnitude (reference conditions its 200x16 MVD priors on
        // the prior-frame motion the same way, macroblock_model.h:44)
        int pm = 0;
        i32 flip = 1;
        if (mc.past) {
          int pv = int(mc.past->mvd[slot][xy]);
          int a = std::abs(pv);
          pm = a == 0 ? 0 : (a <= 3 ? 1 : 2);
          if (pv < 0) flip = -1;  // past-sign coherence (pans keep sign)
        }
        // x first, then y conditioned on |mvd_x| of the same vector
        // (components correlate: a median miss is usually 2-D); slots > 0
        // condition on the previously coded slot's same component
        int sp;
        if (xy == 1) {
          int a = std::abs(int(rec.mvd[slot][0]));
          sp = a == 0 ? 0 : (a <= 3 ? 1 : 2);
        } else if (slot == 0) {
          sp = std::max(nbr_mvd_bucket(mc.left, xy),
                        nbr_mvd_bucket(mc.above, xy));
        } else {
          // (conditioning slots > 0 on the previously coded slot's
          // magnitude was measured WORSE)
          sp = 0;
        }
        // (measured: the reference's delta-vs-past-MVD coding
        // [decode_slice.cpp:2128] LOSES to direct coding here — the
        // spatial median predictor already whitens the field; the PAST
        // MVD magnitude survives only as a context bucket)
        i32 v = flip * code_uegk_mix(io,
                          IO::kIsWriter ? i32(rec.mvd[slot][xy]) * flip : 0,
                          &M.mvd[cb][slot][xy][pm][sp], &M.mvd_c[xy], MIX_K,
                          /*hasZero=*/true);
        if (!IO::kIsWriter) rec.mvd[slot][xy] = i16(v);
      }
    };
    switch (rec.mb_class) {
      case MB_P16x16: code_mv(0); break;
      case MB_P16x8:
      case MB_P8x16:
        code_mv(0);
        code_mv(1);
        break;
      default:  // P8x8 / P8x8REF0
        for (int i = 0; i < 4; ++i) {
          static const int kCnt[4] = {1, 2, 2, 4};
          for (int j = 0; j < kCnt[rec.sub_types[i]]; ++j) code_mv(4 * i + j);
        }
        break;
    }
  }

  // 7. residuals
  io.set_tag(BILL_LUMA_DC);
  if (rec.mb_class == MB_I16x16) {
    for (int i = 0; i < 16; ++i) {
      int pastb = 0;
      i32 flip = 1;
      if (mc.past) {
        i32 pv = mc.past->luma_dc[i];
        pastb = pv == 0 ? 0 : (pv == 1 || pv == -1 ? 1 : 2);
        if (pv < 0) flip = -1;  // past-sign coherence (as the AC codec)
      }
      i32 v = flip * code_int_mix(io,
                       IO::kIsWriter ? i32(rec.luma_dc[i]) * flip : 0,
                       &M.luma_dc[i][pastb], &M.luma_dc_c[pastb], MIX_K,
                       /*hasZero=*/true,
                       /*hasSign=*/true);
      if (!IO::kIsWriter) rec.luma_dc[i] = i16(v);
    }
  }
  io.set_tag(BILL_CHROMA_DC);
  if (rec.cbp_chroma == 1 || rec.cbp_chroma == 2) {
    for (int c = 0; c < 2; ++c) {
      for (int i = 0; i < 4; ++i) {
        int idx = c * 4 + i;
        int pastb = 0;
        i32 flip = 1;
        if (mc.past) {
          i32 pv = mc.past->chroma_dc[c][i];
          pastb = pv == 0 ? 0 : (pv == 1 || pv == -1 ? 1 : 2);
          if (pv < 0) flip = -1;  // past-sign coherence
        }
        i32 v = flip * code_int_mix(io,
                         IO::kIsWriter ? i32(rec.chroma_dc[c][i]) * flip : 0,
                         &M.chroma_dc[idx][pastb], &M.chroma_dc_c[pastb],
                         24, true, true);
        if (!IO::kIsWriter) rec.chroma_dc[c][i] = i16(v);
      }
    }
  }
  bool is_i16 = rec.mb_class == MB_I16x16;
  for (int i8 = 0; i8 < 4; ++i8) {
    if (!(rec.cbp_luma & (1 << i8))) continue;
    if (rec.transform_8x8) {
      code_block<IO, true>(io, mc, 0, i8, rec.luma_ac8[i8], 0, 64);
    } else {
      for (int b = 0; b < 4; ++b) {
        int r = kBlk4x4DecodeOrder[i8 * 4 + b];
        code_block<IO, false>(io, mc, 0, r, rec.luma_ac[r], is_i16 ? 1 : 0,
                              is_i16 ? 15 : 16);
      }
    }
  }
  if (rec.cbp_chroma == 2) {
    for (int c = 0; c < 2; ++c) {
      for (int b = 0; b < 4; ++b) {
        code_block<IO, false>(io, mc, c + 1, b, rec.chroma_ac[c * 4 + b], 1, 15);
      }
    }
  }
}

// slice-level symbols
template <class IO>
inline int code_skip_run(IO& io, Model& M, FreqImage& fi, int mbx, int mby,
                         int run) {
  io.set_tag(BILL_SKIP);
  int pr = fi.past_skip_run(mbx, mby);
  // log-spaced buckets: fine resolution at short runs (where most of the
  // probability mass lives), coarse at long ones
  int bucket = pr <= 4 ? pr : std::min(12, 3 + ilog2_floor(u32(pr)));
  return code_int_mix(io, run, &M.skip_run[bucket], &M.skip_run_c, MIX_K,
                      /*hasZero=*/true,
                      /*hasSign=*/false);
}

template <class IO>
inline bool code_end_bit(IO& io, Model& M, int mb_index, int remain,
                         bool last_possible, bool after_skip, bool end) {
  // No further MB exists in this frame's walk: the end symbol is
  // deterministic — skip it (both directions know the walk).
  if (last_possible) {
    PIP_CHECK(!IO::kIsWriter || end, "records continue past frame end");
    return true;
  }
  // Near the frame end the remaining-MB count is THE cue (slices end
  // at the frame edge on single-slice streams); far from it, the
  // per-slice MB index captures fixed-size slicing. The old pure
  // mb_index context spent ~2x the reference's end_of_slice bits
  // re-learning the frame length at every position.
  DynProb* base = after_skip ? M.end_bit_skip : M.end_bit;
  int bi = remain <= 8 ? remain : 9 + std::min(mb_index, 2038);
  io.set_tag(BILL_END);
  return io.bit_mix(end, &base[bi], &M.end_bit_c[bi], MIX_K);
}

}  // namespace h264pip
