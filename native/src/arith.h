// Adaptive binary arithmetic coder + integer prior structures.
//
// Reference parity: the libvpx-style bool range coder
// (codec/decoder/core/inc/bitreader.h / bitwriter.h), DynProb and the
// Branch/Unary/UEGk prior family (compression_stream.h:87-244, emitInt /
// scanInt at :523-676). Clean-room redesign: the coder follows the
// public VP8 bool-coder algorithm (RFC 6386 §7); the integer codec keeps
// the proven zero/sign/unary-exponent/mantissa decomposition but uses a
// flat per-(exponent,bit) mantissa context table instead of the
// reference's binary-search indexing, and everything writes into a single
// stream per shard (the reference pays per-tag sidecar overhead).
#pragma once

#include "common.h"

namespace h264pip {

// ---------------------------------------------------------------------------
// Adaptive bit probability: counts-based estimator, halving rescale.
// prob = P(bit==0) scaled to [1,255].
// ---------------------------------------------------------------------------
struct DynProb {
  u8 prob = 128;
  u16 c0 = 0, c1 = 0;

  inline void update(bool bit) {
    if (bit) ++c1; else ++c0;
    prob = u8((256u * (c0 + 1)) / (c0 + c1 + 2));
    if (prob == 0) prob = 1;  // vpx coder requires prob in [1,255]
    // rescale threshold 192 measured best on the tuning corpus
    // (512 -> 192 = 0.3% smaller output: faster tracking of local
    // statistics beats longer memory; 128 and KT estimation both lose)
    if (c0 + c1 > 192) {
      c0 = (c0 + 1) >> 1;
      c1 = (c1 + 1) >> 1;
    }
  }
};

// Count-weighted backoff mix (the PAQ/Kneser-Ney idea, binary case):
// blend a rich context's probability with its coarse parent's by the
// rich context's sample count, so sparse contexts inherit the parent's
// statistics until they have evidence of their own. Writer and reader
// see identical counts (both update in lockstep), so the mixed
// probability is reproducible.
inline u8 mix_prob(const DynProb* rich, const DynProb* coarse, u32 K) {
  u32 n = u32(rich->c0) + u32(rich->c1);
  if (n >= 96) return rich->prob;  // confidence gate: a well-trained
                                   // rich context should not be dragged
                                   // toward the parent forever (the
                                   // count rescale caps n, so the
                                   // parent would keep ~K/(n+K) weight
                                   // for the whole stream)
  u32 p = (n * rich->prob + K * coarse->prob) / (n + K);
  if (p < 1) p = 1;
  if (p > 255) p = 255;
  return u8(p);
}

// ---------------------------------------------------------------------------
// Bool writer (VP8-style range coder, carry propagation into buffer)
// ---------------------------------------------------------------------------
class BoolWriter {
 public:
  BoolWriter() { reset(); }

  void reset() {
    buf_.clear();
    low_ = 0;
    range_ = 255;
    count_ = -24;
    n_bits_ = 0;
  }

  inline void put(bool bit, u8 prob /* P(bit==0) in [1,255] */) {
    ++n_bits_;
    u32 split = 1 + (((range_ - 1) * prob) >> 8);
    if (bit) {
      low_ += split;
      range_ -= split;
    } else {
      range_ = split;
    }
    int shift = __builtin_clz(range_) - 24;  // bring range into [128,255]
    range_ <<= shift;
    count_ += shift;
    if (count_ >= 0) {
      int offset = shift - count_;
      if ((low_ << (offset - 1)) & 0x80000000u) {
        // carry into already-emitted bytes
        int x = int(buf_.size()) - 1;
        while (x >= 0 && buf_[x] == 0xff) {
          buf_[x] = 0;
          --x;
        }
        if (x >= 0) buf_[x] += 1;
      }
      buf_.push_back(u8(low_ >> (24 - offset)));
      low_ <<= offset;
      low_ &= 0xffffff;
      shift = count_;
      count_ -= 8;
    }
    low_ <<= shift;
  }

  inline void put_adaptive(bool bit, DynProb* p) {
    put(bit, p->prob);
    p->update(bit);
  }

  std::vector<u8> finish() {
    for (int i = 0; i < 32; ++i) put(false, 128);
    return std::move(buf_);
  }

  size_t size() const { return buf_.size(); }
  u64 n_bits() const { return n_bits_; }

 private:
  std::vector<u8> buf_;
  u32 low_;
  u32 range_;
  int count_;
  u64 n_bits_;
};

// ---------------------------------------------------------------------------
// Bool reader
// ---------------------------------------------------------------------------
class BoolReader {
 public:
  BoolReader() : data_(nullptr), size_(0) {}

  void init(const u8* data, size_t size) {
    data_ = data;
    size_ = size;
    pos_ = 0;
    value_ = 0;
    count_ = -8;
    range_ = 255;
    fill();
  }

  inline bool get(u8 prob) {
    u32 split = 1 + (((range_ - 1) * prob) >> 8);
    if (count_ < 0) fill();
    u64 bigsplit = u64(split) << (64 - 8);
    bool bit;
    if (value_ >= bigsplit) {
      range_ -= split;
      value_ -= bigsplit;
      bit = true;
    } else {
      range_ = split;
      bit = false;
    }
    int shift = __builtin_clz(range_) - 24;
    range_ <<= shift;
    value_ <<= shift;
    count_ -= shift;
    return bit;
  }

  inline bool get_adaptive(DynProb* p) {
    bool bit = get(p->prob);
    p->update(bit);
    return bit;
  }

 private:
  void fill() {
    int shift = 64 - 8 - (count_ + 8);
    while (shift >= 0) {
      if (pos_ >= size_) {
        // feeding zeros past the end is fine: the encoder's 32-bit flush
        // guarantees all real symbols resolve before we'd consume them
        count_ += 8;
        value_ |= 0;
        shift -= 8;
        continue;
      }
      count_ += 8;
      value_ |= u64(data_[pos_++]) << shift;
      shift -= 8;
    }
  }

  const u8* data_;
  size_t size_;
  size_t pos_;
  u64 value_;
  int count_;
  u32 range_;
};

// ---------------------------------------------------------------------------
// Prior structures over the single stream.
//
// All coding helpers live on Coder<IO>, templated over direction so the
// emit and scan paths are a single body (the determinism contract between
// compress and recode is enforced structurally).
// ---------------------------------------------------------------------------

// N-bit value via a full binary tree of adaptive probs (2^N - 1 nodes).
template <int N>
struct BranchPrior {
  DynProb p[(1 << N) - 1];
};

// Unary with adaptive probs for the first N positions (clamped after).
template <int N>
struct UnaryPrior {
  DynProb p[N];
  DynProb* at(int i) { return &p[i < N ? i : N - 1]; }
};

// Integer prior: optional zero bit, optional sign bit, unary exponent with
// E adaptive positions, mantissa bits with per-(exponent,position) probs.
// ORDER low bits are coded explicitly (Rice-style).
template <int E, int MEXP, int ORDER>
struct IntPriorT {
  DynProb zero;
  DynProb sign;
  UnaryPrior<E> exponent;
  // mantissa context: [exponent clamp MEXP][bit index clamp 16]
  DynProb mantissa[MEXP][16];
  DynProb* mant(int e, int i) {
    if (e >= MEXP) e = MEXP - 1;
    if (i >= 16) i = 15;
    return &mantissa[e][i];
  }
};

// UEGk prior: unary part up to THRESH (M adaptive positions), then escape
// into an IntPriorT tail.
template <int THRESH, int M, int E, int MEXP, int ORDER>
struct UEGkPriorT {
  DynProb zero;
  DynProb sign;    // used when a STRONG sign-prediction cue flipped the
                   // value (co-located PAST / neighbor-block value)
  DynProb sign0;   // used when no cue exists (stays near 50/50 without
                   // polluting the flipped prior's statistics)
  DynProb sign_w;  // weak cue (previous coefficient in this block):
                   // real but much less reliable than the strong cues —
                   // sharing its statistics with `sign` diluted both
  DynProb sign_n;  // neighbor-block cue (left/above same position):
                   // spatial sign coherence, between past and weak
  UnaryPrior<M> first;
  IntPriorT<E, MEXP, ORDER> tail;
};

class StreamWriter;
class StreamReader;

// Direction-generic coder facade.
class StreamWriter {
 public:
  BoolWriter w;
  static constexpr bool kIsWriter = true;
  // Billing: compressed BITS per feature tag (sampling: each output byte
  // billed to the feature of the decision that produced it — reference:
  // ArithmeticCodedOutput::emitBit billing, compression_stream.h:407-435).
  double* bill = nullptr;  // array indexed by tag
  // prior-hit stats (reference PRIOR_STATS): decisions + predicted-symbol
  // hits per tag, counted when enabled
  double* prior_total = nullptr;
  double* prior_hits = nullptr;
  int tag = 0;

  inline void set_tag(int t) { tag = t; }
  inline bool bit(bool b, DynProb* p) {
    size_t before = w.size();
    if (prior_total) {
      prior_total[tag] += 1.0;
      prior_hits[tag] += double((p->prob >= 128) == !b);
    }
    w.put_adaptive(b, p);
    if (bill) bill[tag] += 8.0 * double(w.size() - before);
    return b;
  }
  inline bool bit_mix(bool b, DynProb* rich, DynProb* coarse, u32 K) {
    size_t before = w.size();
    u8 p = mix_prob(rich, coarse, K);
    if (prior_total) {
      prior_total[tag] += 1.0;
      prior_hits[tag] += double((p >= 128) == !b);
    }
    w.put(b, p);
    rich->update(b);
    coarse->update(b);
    if (bill) bill[tag] += 8.0 * double(w.size() - before);
    return b;
  }
  inline u32 raw_bits(u32 v, int n) {
    size_t before = w.size();
    for (int i = n - 1; i >= 0; --i) w.put((v >> i) & 1, 128);
    if (bill) bill[tag] += 8.0 * double(w.size() - before);
    return v;
  }
  u64 n_bits() const { return w.n_bits(); }
};

class StreamReader {
 public:
  BoolReader r;
  static constexpr bool kIsWriter = false;

  inline void set_tag(int) {}
  inline bool bit(bool /*unused*/, DynProb* p) { return r.get_adaptive(p); }
  inline bool bit_mix(bool, DynProb* rich, DynProb* coarse, u32 K) {
    bool b = r.get(mix_prob(rich, coarse, K));
    rich->update(b);
    coarse->update(b);
    return b;
  }
  inline u32 raw_bits(u32 /*unused*/, int n) {
    u32 v = 0;
    for (int i = 0; i < n; ++i) v = (v << 1) | u32(r.get(128));
    return v;
  }
};

// --- generic symbol codecs (templated over StreamWriter/StreamReader) ---

// Helper: one adaptive bit, optionally mixed with a coarse parent.
template <class IO>
inline bool mbit(IO& io, bool b, DynProb* rich, DynProb* coarse, u32 K) {
  return coarse ? io.bit_mix(b, rich, coarse, K) : io.bit(b, rich);
}

// Branch-tree codec mixed with a coarse parent (context mixing).
template <class IO, int N>
inline u32 code_branch_mix(IO& io, u32 val, BranchPrior<N>* prior,
                           BranchPrior<N>* parent, u32 K) {
  u32 out = 0;
  int node = 0;
  for (int d = N - 1; d >= 0; --d) {
    bool b = io.bit_mix((val >> d) & 1, &prior->p[node],
                        &parent->p[node], K);
    out = (out << 1) | u32(b);
    node = 2 * node + 1 + (b ? 1 : 0);
  }
  return out;
}

template <class IO, int N>
inline u32 code_branch(IO& io, u32 val, BranchPrior<N>* prior) {
  // binary tree walk, MSB first; node index in heap order
  u32 out = 0;
  int node = 0;
  for (int d = N - 1; d >= 0; --d) {
    bool b = io.bit((val >> d) & 1, &prior->p[node]);
    out = (out << 1) | u32(b);
    node = 2 * node + 1 + (b ? 1 : 0);
  }
  return out;
}

template <class IO, int N>
inline int code_unary(IO& io, int val, UnaryPrior<N>* prior, int cap = -1) {
  // emits val ones then a zero; if cap >= 0 and val reaches cap, no
  // terminator (value saturated).
  int i = 0;
  while (true) {
    if (cap >= 0 && i == cap) return i;
    bool more = io.bit(i < val, prior->at(i));
    if (!more) return i;
    ++i;
    PIP_CHECK(i < (1 << 20), "unary runaway");
  }
}

// code_unary blended with a coarse parent prior (context mixing).
template <class IO, int N, int NC>
inline int code_unary_mix(IO& io, int val, UnaryPrior<N>* prior,
                          UnaryPrior<NC>* parent, u32 K, int cap = -1) {
  int i = 0;
  while (true) {
    if (cap >= 0 && i == cap) return i;
    bool more = io.bit_mix(i < val, prior->at(i), parent->at(i), K);
    if (!more) return i;
    ++i;
    PIP_CHECK(i < (1 << 20), "unary runaway");
  }
}

// Core int codec. Codes `val` given structure flags. Returns the value
// (== val when writing). hasZero: val may be 0. hasSign: val may be <0.
template <class IO, int E, int MEXP, int ORDER>
inline i32 code_int(IO& io, i32 val, IntPriorT<E, MEXP, ORDER>* prior,
                    bool hasZero, bool hasSign) {
  if (hasZero) {
    bool z = io.bit(val == 0, &prior->zero);
    if (z) return 0;
  }
  bool neg = false;
  if (hasSign) {
    neg = io.bit(val < 0, &prior->sign);
  }
  u32 mag = 0;
  if (IO::kIsWriter) {
    mag = u32(val < 0 ? -val : val);
    PIP_CHECK(mag >= 1, "code_int needs |val| >= 1");
  }
  // data in [0, inf): mag - 1. high = 1 + (data >> ORDER) has bit_length
  // log2+1; exponent = floor(log2(high)).
  u32 data = mag - 1;  // writer only
  u32 high = 1 + (data >> ORDER);
  int log2 = IO::kIsWriter ? ilog2_floor(high) : 0;
  log2 = code_unary(io, log2, &prior->exponent);
  PIP_CHECK(log2 < 30, "code_int exponent overflow");
  // mantissa: log2 bits of high below the MSB, then ORDER low bits
  u32 rhigh = 1;
  for (int i = log2 - 1; i >= 0; --i) {
    bool b = io.bit((high >> i) & 1, prior->mant(log2, log2 - 1 - i));
    rhigh = (rhigh << 1) | u32(b);
  }
  u32 rlow = 0;
  for (int i = ORDER - 1; i >= 0; --i) {
    bool b = io.bit((data >> i) & 1, prior->mant(log2, log2 + (ORDER - 1 - i)));
    rlow = (rlow << 1) | u32(b);
  }
  u32 rdata = ((rhigh - 1) << ORDER) | rlow;
  i32 result = i32(rdata + 1);
  return neg ? -result : result;
}

// code_int with every decision blended against a coarse parent prior
// of the same shape (context mixing — sparse rich contexts inherit the
// parent's statistics until they accumulate their own evidence).
template <class IO, int E, int MEXP, int ORDER>
inline i32 code_int_mix(IO& io, i32 val, IntPriorT<E, MEXP, ORDER>* prior,
                        IntPriorT<E, MEXP, ORDER>* parent, u32 K,
                        bool hasZero, bool hasSign) {
  if (hasZero) {
    bool z = io.bit_mix(val == 0, &prior->zero, &parent->zero, K);
    if (z) return 0;
  }
  bool neg = false;
  if (hasSign) {
    neg = io.bit_mix(val < 0, &prior->sign, &parent->sign, K);
  }
  u32 mag = 0;
  if (IO::kIsWriter) {
    mag = u32(val < 0 ? -val : val);
    PIP_CHECK(mag >= 1, "code_int needs |val| >= 1");
  }
  u32 data = mag - 1;
  u32 high = 1 + (data >> ORDER);
  int log2 = IO::kIsWriter ? ilog2_floor(high) : 0;
  log2 = code_unary_mix(io, log2, &prior->exponent, &parent->exponent, K);
  PIP_CHECK(log2 < 30, "code_int exponent overflow");
  u32 rhigh = 1;
  for (int i = log2 - 1; i >= 0; --i) {
    bool b = io.bit_mix((high >> i) & 1, prior->mant(log2, log2 - 1 - i),
                        parent->mant(log2, log2 - 1 - i), K);
    rhigh = (rhigh << 1) | u32(b);
  }
  u32 rlow = 0;
  for (int i = ORDER - 1; i >= 0; --i) {
    bool b = io.bit_mix((data >> i) & 1,
                        prior->mant(log2, log2 + (ORDER - 1 - i)),
                        parent->mant(log2, log2 + (ORDER - 1 - i)), K);
    rlow = (rlow << 1) | u32(b);
  }
  u32 rdata = ((rhigh - 1) << ORDER) | rlow;
  i32 result = i32(rdata + 1);
  return neg ? -result : result;
}

// tag_sign/tag_mag >= 0 re-tag the sign and magnitude decisions for
// sub-feature billing resolution (reference billTo() granularity); the
// zero/EOB bit stays on the caller's current tag.
template <class IO, int THRESH, int M, int E, int MEXP, int ORDER>
inline i32 code_uegk(IO& io, i32 val, UEGkPriorT<THRESH, M, E, MEXP, ORDER>* prior,
                     bool hasZero, int tag_sign = -1, int tag_mag = -1,
                     int sign_cue = 1) {
  if (hasZero) {
    bool z = io.bit(val == 0, &prior->zero);
    if (z) return 0;
  }
  if (tag_sign >= 0) io.set_tag(tag_sign);
  DynProb* sp = sign_cue == 0
                    ? &prior->sign0
                    : (sign_cue == 2
                           ? &prior->sign_w
                           : (sign_cue == 3 ? &prior->sign_n
                                            : &prior->sign));
  bool neg = io.bit(val < 0, sp);
  if (tag_mag >= 0) io.set_tag(tag_mag);
  u32 mag = IO::kIsWriter ? u32(val < 0 ? -val : val) : 0;
  int first = code_unary(io, IO::kIsWriter ? int(mag - 1) : 0, &prior->first, THRESH);
  if (first < THRESH) {
    i32 r = first + 1;
    return neg ? -r : r;
  }
  i32 second = code_int(io, IO::kIsWriter ? i32(mag - 1 - THRESH) : 0, &prior->tail,
                        /*hasZero=*/true, /*hasSign=*/false);
  i32 r = THRESH + second + 1;
  return neg ? -r : r;
}

// UEGk codec with every decision blended against a coarse parent of
// the same prior type (context mixing).
template <class IO, int THRESH, int M, int E, int MEXP, int ORDER>
inline i32 code_uegk_mix(IO& io, i32 val,
                         UEGkPriorT<THRESH, M, E, MEXP, ORDER>* prior,
                         UEGkPriorT<THRESH, M, E, MEXP, ORDER>* parent,
                         u32 K, bool hasZero, int sign_cue = 1) {
  if (hasZero) {
    bool z = io.bit_mix(val == 0, &prior->zero, &parent->zero, K);
    if (z) return 0;
  }
  DynProb* sp = sign_cue == 0 ? &prior->sign0
                              : (sign_cue == 2 ? &prior->sign_w
                                               : (sign_cue == 3
                                                      ? &prior->sign_n
                                                      : &prior->sign));
  DynProb* spp = sign_cue == 0 ? &parent->sign0
                               : (sign_cue == 2 ? &parent->sign_w
                                                : (sign_cue == 3
                                                       ? &parent->sign_n
                                                       : &parent->sign));
  bool neg = io.bit_mix(val < 0, sp, spp, K);
  u32 mag = IO::kIsWriter ? u32(val < 0 ? -val : val) : 0;
  int first = code_unary_mix(io, IO::kIsWriter ? int(mag - 1) : 0,
                             &prior->first, &parent->first, K, THRESH);
  if (first < THRESH) {
    i32 r = first + 1;
    return neg ? -r : r;
  }
  i32 second =
      code_int_mix(io, IO::kIsWriter ? i32(mag - 1 - THRESH) : 0,
                   &prior->tail, &parent->tail, K,
                   /*hasZero=*/true, /*hasSign=*/false);
  i32 r = THRESH + second + 1;
  return neg ? -r : r;
}

// Split AC codec: zero + sign decisions from the (position-rich) zp
// prior, magnitude (unary + tail) from a dedicated small mp prior —
// see model.h MagPrior. Identical wire behavior to code_uegk except
// for which adaptive probabilities the magnitude bits train.
template <class IO, class ZP, class MP>
inline i32 code_ac_split(IO& io, i32 val, ZP* zp, MP* mp, bool hasZero,
                         int tag_sign = -1, int tag_mag = -1,
                         int sign_cue = 1, DynProb* zero_c = nullptr,
                         DynProb* gt1_c = nullptr, u32 K = 24,
                         DynProb* sign_c = nullptr, MP* mag_c = nullptr) {
  if (hasZero) {
    bool z = zero_c ? io.bit_mix(val == 0, &zp->zero, zero_c, K)
                    : io.bit(val == 0, &zp->zero);
    if (z) return 0;
  }
  if (tag_sign >= 0) io.set_tag(tag_sign);
  DynProb* sp = sign_cue == 0
                    ? &zp->sign0
                    : (sign_cue == 2
                           ? &zp->sign_w
                           : (sign_cue == 3 ? &zp->sign_n : &zp->sign));
  bool neg = sign_c ? io.bit_mix(val < 0, sp, sign_c, K)
                    : io.bit(val < 0, sp);
  if (tag_mag >= 0) io.set_tag(tag_mag);
  u32 mag = IO::kIsWriter ? u32(val < 0 ? -val : val) : 0;
  // gt1 flag (|v| == 1 vs > 1) keeps the position-rich zp context —
  // it is the magnitude decision position/nzleft genuinely predict
  // (dominant on CAVLC streams); the rest of the unary + the tail
  // train the dedicated mp table (dominant on CABAC streams, where
  // the rich table's dilution never let them adapt).
  int valm = IO::kIsWriter ? int(mag - 1) : 0;
  bool gt1 = gt1_c ? io.bit_mix(IO::kIsWriter ? (valm > 0) : false,
                                zp->first.at(0), gt1_c, K)
                   : io.bit(IO::kIsWriter ? (valm > 0) : false,
                            zp->first.at(0));
  if (!gt1) return neg ? -1 : 1;
  int rest = mag_c ? code_unary_mix(io, IO::kIsWriter ? valm - 1 : 0,
                                    &mp->first, &mag_c->first, K, 13)
                   : code_unary(io, IO::kIsWriter ? valm - 1 : 0,
                                &mp->first, 13);
  if (rest < 13) {
    i32 r = rest + 2;
    return neg ? -r : r;
  }
  i32 second =
      mag_c ? code_int_mix(io, IO::kIsWriter ? i32(mag - 1 - 14) : 0,
                           &mp->tail, &mag_c->tail, K,
                           /*hasZero=*/true, /*hasSign=*/false)
            : code_int(io, IO::kIsWriter ? i32(mag - 1 - 14) : 0,
                       &mp->tail, /*hasZero=*/true, /*hasSign=*/false);
  i32 r = 14 + second + 1;
  return neg ? -r : r;
}

// code_int with hasZero semantics but no separate struct: convenience
// aliases matching the reference's prior families.
template <int E, int MEXP>
using UIntPrior = IntPriorT<E, MEXP, 0>;  // 0..inf, no sign

}  // namespace h264pip
