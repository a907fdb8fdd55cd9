// Bit-level I/O over RBSP payloads + Annex-B emulation-prevention escaping.
//
// Reference parity: codec/decoder/core/inc/dec_golomb.h (bit reads,
// ue/se/te), codec/decoder/core/src/bit_stream.cpp (EBSP handling), and the
// encoder-side BsWrite* (codec/encoder/core). Clean-room implementation
// from the H.264 spec (ISO 14496-10 §7.3, §9.1).
#pragma once

#include "common.h"

namespace h264pip {

// ---------------------------------------------------------------------------
// EBSP <-> RBSP
// ---------------------------------------------------------------------------

// Remove 00 00 03 emulation-prevention bytes. Input is a NAL payload
// (without start code, including the NAL header byte(s)).
std::vector<u8> ebsp_to_rbsp(const u8* data, size_t size);

// Insert 00 00 03 escapes per spec (after any 00 00 followed by a byte
// <= 0x03). `start` is the offset at which escaping begins (NAL header
// bytes are never escaped... strictly speaking escaping covers the whole
// payload, but a NAL header byte is never 0x00 so starting at 0 is fine).
std::vector<u8> rbsp_to_ebsp(const std::vector<u8>& rbsp);

// ---------------------------------------------------------------------------
// BitReader over an RBSP buffer (MSB-first)
// ---------------------------------------------------------------------------
class BitReader {
 public:
  BitReader() : data_(nullptr), size_(0), pos_bits_(0) {}
  BitReader(const u8* data, size_t size) : data_(data), size_(size), pos_bits_(0) {}

  size_t pos_bits() const { return pos_bits_; }
  size_t size_bits() const { return size_ * 8; }
  void seek_bits(size_t p) { pos_bits_ = p; }

  u32 peek(int n) const {  // n in [0,24]
    u32 v = 0;
    size_t byte = pos_bits_ >> 3;
    int shift = 24 - int(pos_bits_ & 7);
    // load 4 bytes (clamped)
    for (int i = 0; i < 4; ++i) {
      v = (v << 8) | (byte + i < size_ ? data_[byte + i] : 0);
    }
    v <<= (int(pos_bits_ & 7));
    (void)shift;
    return n == 0 ? 0 : (v >> (32 - n));
  }

  u32 u(int n) {  // read n bits, n in [0,32]
    PIP_CHECK(pos_bits_ + n <= size_ * 8, "bitreader overrun");
    u32 v = 0;
    int left = n;
    while (left > 24) {
      v = (v << 24) | u(24);
      left -= 24;
    }
    if (left > 0) {
      v = (v << left) | peek(left);
      pos_bits_ += left;
    }
    return v;
  }

  u32 bit() { return u(1); }

  u32 ue() {  // Exp-Golomb unsigned
    int zeros = 0;
    while (true) {
      PIP_CHECK(pos_bits_ < size_ * 8, "ue overrun");
      if (u(1)) break;
      ++zeros;
      PIP_CHECK(zeros <= 31, "ue too long");
    }
    if (zeros == 0) return 0;
    return (1u << zeros) - 1 + u(zeros);
  }

  i32 se() {  // Exp-Golomb signed
    u32 k = ue();
    // 0,1,2,3.. -> 0,1,-1,2,-2...
    return (k & 1) ? i32((k + 1) >> 1) : -i32(k >> 1);
  }

  u32 te(int range) {  // truncated Exp-Golomb
    if (range == 1) return u(1) ^ 1;
    return ue();
  }

  bool byte_aligned() const { return (pos_bits_ & 7) == 0; }

  // more_rbsp_data(): true if there is data beyond the rbsp_stop_one_bit.
  bool more_rbsp_data() const {
    if (pos_bits_ >= size_ * 8) return false;
    // find last byte that is nonzero
    size_t last = size_;
    while (last > 0 && data_[last - 1] == 0) --last;
    if (last == 0) return false;
    // position of the stop bit: last set bit of data_[last-1]
    u8 b = data_[last - 1];
    int low = __builtin_ctz(b);  // trailing zeros
    size_t stop_bit_pos = (last - 1) * 8 + (7 - low);
    return pos_bits_ < stop_bit_pos;
  }

  const u8* data() const { return data_; }
  size_t size() const { return size_; }

 private:
  const u8* data_;
  size_t size_;
  size_t pos_bits_;
};

// ---------------------------------------------------------------------------
// BitWriter producing an RBSP buffer (MSB-first)
// ---------------------------------------------------------------------------
class BitWriter {
 public:
  BitWriter() { clear(); }

  void clear() {
    buf_.clear();
    cur_ = 0;
    nbits_ = 0;
  }

  size_t pos_bits() const { return buf_.size() * 8 + nbits_; }

  void put(u32 val, int n) {  // write n bits (MSB-first), n in [0,32]
    while (n > 16) {
      put((val >> (n - 16)) & 0xffff, 16);
      n -= 16;
    }
    if (n == 0) return;
    val &= (n == 32 ? 0xffffffffu : ((1u << n) - 1));
    cur_ = (cur_ << n) | val;
    nbits_ += n;
    while (nbits_ >= 8) {
      nbits_ -= 8;
      buf_.push_back(u8((cur_ >> nbits_) & 0xff));
    }
  }

  void put_bit(u32 b) { put(b, 1); }

  void put_ue(u32 v) {
    int len = bit_length(v + 1);
    put(0, len - 1);
    put(v + 1, len);
  }

  void put_se(i32 v) {
    u32 k = v <= 0 ? u32(-v) * 2 : u32(v) * 2 - 1;
    put_ue(k);
  }

  void put_te(u32 v, int range) {
    if (range == 1) put_bit(v ^ 1);
    else put_ue(v);
  }

  // Append another writer's bits.
  void append(const BitWriter& o) {
    for (u8 b : o.buf_) put(b, 8);
    if (o.nbits_ > 0) put(u32(o.cur_) & ((1u << o.nbits_) - 1), o.nbits_);
  }

  // Append raw bits from a reader span [start_bit, end_bit).
  void append_bits(const u8* data, size_t start_bit, size_t end_bit) {
    size_t p = start_bit;
    while (p < end_bit) {
      int n = int(std::min<size_t>(16, end_bit - p));
      // read n bits at p from data
      u32 v = 0;
      for (int i = 0; i < n; ++i) {
        size_t bp = p + i;
        v = (v << 1) | ((data[bp >> 3] >> (7 - (bp & 7))) & 1);
      }
      put(v, n);
      p += n;
    }
  }

  void rbsp_trailing_bits() {
    put_bit(1);
    while (nbits_ != 0) put_bit(0);
  }

  bool byte_aligned() const { return nbits_ == 0; }

  // Finish: returns RBSP bytes; requires byte alignment.
  const std::vector<u8>& bytes() const {
    PIP_CHECK(nbits_ == 0, "bitwriter not byte aligned");
    return buf_;
  }
  std::vector<u8> take() {
    PIP_CHECK(nbits_ == 0, "bitwriter not byte aligned");
    return std::move(buf_);
  }

  int pending_bits() const { return nbits_; }
  u64 pending_value() const { return cur_ & ((1ull << nbits_) - 1); }

 private:
  std::vector<u8> buf_;
  u64 cur_;
  int nbits_;
};

// Varint (LEB128) helpers for the container.
void put_varint(std::vector<u8>& out, u64 v);
u64 get_varint(const u8* data, size_t size, size_t* pos);

}  // namespace h264pip
