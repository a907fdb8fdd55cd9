// CABAC arithmetic engine (decode + bit-exact encode) and adaptive
// context state, per ISO 14496-10 §9.3.
//
// Reference parity: cabac_decoder.{h,cpp} (decode engine),
// set_mb_syn_cabac.cpp (encode engine used verbatim by the reference's
// recode path). Clean-room: the decoder here is the spec's bit-serial
// formulation (one renorm pull per loop) rather than the reference's
// 64-bit batched window — bit-consumption-equivalent; the encoder is the
// spec informative encoder (low/range, outstanding bits, discarded first
// bit), which every production encoder implements and which bit-exact
// reconstruction therefore relies on.
#pragma once

#include "cabac_tables.h"
#include "common.h"

namespace h264pip {

struct CabacCtx {
  u8 state = 0;
  u8 mps = 0;
};

// Debug decision tracing (mirrors the reference's CABAC_LOG_DECISIONS
// format for diffing); enabled via PIP_CABAC_LOG env var.
extern bool g_cabac_log;
extern long g_cabac_log_count;

struct CabacContexts {
  CabacCtx ctx[460];

  // slice_qp: luma QP of the slice; model: 0 for I slices else
  // cabac_init_idc + 1.
  void init(bool is_i_slice, int cabac_init_idc, int qp) {
    int model = is_i_slice ? 0 : cabac_init_idc + 1;
    for (int i = 0; i < 460; ++i) {
      int m = kCabacCtxInit[i][model][0];
      int n = kCabacCtxInit[i][model][1];
      int pre = ((m * qp) >> 4) + n;
      pre = pre < 1 ? 1 : (pre > 126 ? 126 : pre);
      if (pre <= 63) {
        ctx[i].state = u8(63 - pre);
        ctx[i].mps = 0;
      } else {
        ctx[i].state = u8(pre - 64);
        ctx[i].mps = 1;
      }
    }
  }
};

// ---------------------------------------------------------------------------
// Decoder (bit-serial; feeds zero bits past the end of the buffer)
// ---------------------------------------------------------------------------
class CabacDec {
 public:
  void init(const u8* data, size_t size, size_t start_byte) {
    data_ = data;
    size_ = size;
    bitpos_ = start_byte * 8;
    range_ = 510;
    offset_ = 0;
    for (int i = 0; i < 9; ++i) offset_ = (offset_ << 1) | pull();
  }

  // re-init mid-stream (after PCM samples), byte aligned
  void reinit_at(size_t byte_pos) { init(data_, size_, byte_pos); }

  inline int pull() {
    u32 b = 0;
    if (bitpos_ < size_ * 8) {
      b = (data_[bitpos_ >> 3] >> (7 - (bitpos_ & 7))) & 1;
    }
    ++bitpos_;
    return int(b);
  }

  bool decision_at(CabacCtx* c, int ctx_idx) {
    u8 st = c->state, mps = c->mps;
    u32 rlps = kCabacRangeLps[c->state][(range_ >> 6) & 3];
    range_ -= rlps;
    bool bin;
    if (offset_ >= range_) {
      bin = !c->mps;
      offset_ -= range_;
      range_ = rlps;
      if (c->state == 0) c->mps ^= 1;
      c->state = kCabacStateTrans[c->state][0];
    } else {
      bin = c->mps;
      c->state = kCabacStateTrans[c->state][1];
    }
    while (range_ < 256) {
      range_ <<= 1;
      offset_ = (offset_ << 1) | u32(pull());
    }
    if (g_cabac_log) {
      fprintf(stderr, "Decode Decision %ld: [%d]:%d/%d -> %d\n",
              ++g_cabac_log_count, ctx_idx, st, mps, int(bin));
    }
    return bin;
  }
  bool decision(CabacCtx* c) { return decision_at(c, -1); }

  bool bypass() {
    offset_ = (offset_ << 1) | u32(pull());
    bool bin = false;
    if (offset_ >= range_) {
      offset_ -= range_;
      bin = true;
    }
    if (g_cabac_log) {
      fprintf(stderr, "Decode Decision %ld: Bypass -> %d\n",
              ++g_cabac_log_count, int(bin));
    }
    return bin;
  }

  bool terminate() {
    range_ -= 2;
    bool bin = true;
    if (offset_ >= range_) {
      bin = true;  // no renorm; caller handles slice/PCM end
    } else {
      bin = false;
      while (range_ < 256) {
        range_ <<= 1;
        offset_ = (offset_ << 1) | u32(pull());
      }
    }
    if (g_cabac_log) {
      fprintf(stderr, "Decode Decision %ld: Terminate -> %d\n",
              ++g_cabac_log_count, int(bin));
    }
    return bin;
  }

  // Byte position after the codeword so far (for PCM samples / slice end):
  // ceil(consumed_bits / 8).
  size_t consumed_bytes() const { return (bitpos_ + 7) >> 3; }
  // Raw bit position (for original-bits billing: attribute renorm pulls
  // to the syntax element that triggered them, like the reference's
  // BILL_BITS reader-side accounting, dec_golomb.h:71-82).
  size_t bitpos() const { return bitpos_; }

 private:
  const u8* data_ = nullptr;
  size_t size_ = 0;
  size_t bitpos_ = 0;
  u32 range_ = 510;
  u32 offset_ = 0;
};

// ---------------------------------------------------------------------------
// Encoder (spec informative encoder: PutBit with outstanding bits and a
// discarded leading bit; flush embeds the rbsp stop bit)
// ---------------------------------------------------------------------------
class CabacEnc {
 public:
  void init() {
    low_ = 0;
    range_ = 510;
    outstanding_ = 0;
    first_ = true;
    cur_ = 0;
    nbits_ = 0;
    buf_.clear();
  }

  // re-init mid-stream (after PCM): arithmetic state resets, byte buffer
  // continues.
  void reinit() {
    low_ = 0;
    range_ = 510;
    outstanding_ = 0;
    first_ = true;
    PIP_CHECK(nbits_ == 0, "cabac reinit not byte aligned");
  }

  void encode(CabacCtx* c, bool bin) {
    u32 rlps = kCabacRangeLps[c->state][(range_ >> 6) & 3];
    range_ -= rlps;
    if (bin != bool(c->mps)) {
      low_ += range_;
      range_ = rlps;
      if (c->state == 0) c->mps ^= 1;
      c->state = kCabacStateTrans[c->state][0];
    } else {
      c->state = kCabacStateTrans[c->state][1];
    }
    renorm();
  }

  void encode_bypass(bool bin) {
    low_ <<= 1;
    if (bin) low_ += range_;
    if (low_ >= 1024) {
      put_bit(1);
      low_ -= 1024;
    } else if (low_ < 512) {
      put_bit(0);
    } else {
      low_ -= 512;
      ++outstanding_;
    }
  }

  void encode_terminate(bool bin) {
    range_ -= 2;
    if (bin) {
      low_ += range_;
      range_ = 2;
      renorm();
      put_bit((low_ >> 9) & 1);
      // final two bits: (low>>7)&3 with the stop bit OR'd in
      push_raw(((low_ >> 7) & 3) | 1, 2);
    } else {
      renorm();
    }
  }

  // Slice end after encode_terminate(1): if the codeword tail (whose last
  // bit is already a '1' stop bit) ends byte-aligned, done; otherwise pad
  // zeros up to the final bit of the byte and place the rbsp stop bit
  // there (observed trailing convention of conformant encoders).
  void flush_slice_end() {
    if (nbits_ != 0) {
      push_raw(0, 7 - nbits_);
      push_raw(1, 1);
    }
  }

  // After encode_terminate(1): pad the final partial byte with zeros and
  // return the byte stream position (used for both slice end and PCM
  // alignment).
  void flush_align() {
    if (nbits_ > 0) {
      cur_ <<= (8 - nbits_);
      buf_.push_back(u8(cur_ & 0xff));
      cur_ = 0;
      nbits_ = 0;
    }
  }

  void put_bytes(const u8* p, size_t n) {
    PIP_CHECK(nbits_ == 0, "cabac put_bytes not aligned");
    buf_.insert(buf_.end(), p, p + n);
  }

  const std::vector<u8>& bytes() const { return buf_; }
  std::vector<u8> take() { return std::move(buf_); }

 private:
  void renorm() {
    while (range_ < 256) {
      if (low_ < 256) {
        put_bit(0);
      } else if (low_ >= 512) {
        low_ -= 512;
        put_bit(1);
      } else {
        low_ -= 256;
        ++outstanding_;
      }
      range_ <<= 1;
      low_ <<= 1;
    }
  }

  void put_bit(u32 b) {
    if (first_) {
      first_ = false;
    } else {
      push_raw(b, 1);
    }
    while (outstanding_ > 0) {
      push_raw(b ^ 1, 1);
      --outstanding_;
    }
  }

  void push_raw(u32 v, int n) {
    cur_ = (cur_ << n) | (v & ((1u << n) - 1));
    nbits_ += n;
    while (nbits_ >= 8) {
      nbits_ -= 8;
      buf_.push_back(u8((cur_ >> nbits_) & 0xff));
    }
  }

  std::vector<u8> buf_;
  u32 low_ = 0;
  u32 range_ = 510;
  int outstanding_ = 0;
  bool first_ = true;
  u64 cur_ = 0;
  int nbits_ = 0;
};

}  // namespace h264pip
