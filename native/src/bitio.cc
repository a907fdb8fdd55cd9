#include "bitio.h"

namespace h264pip {

std::vector<u8> ebsp_to_rbsp(const u8* data, size_t size) {
  std::vector<u8> out;
  out.reserve(size);
  int zeros = 0;
  for (size_t i = 0; i < size; ++i) {
    u8 b = data[i];
    if (zeros >= 2 && b == 0x03 && i + 1 < size && data[i + 1] <= 0x03) {
      // emulation prevention byte: drop
      zeros = 0;
      continue;
    }
    // Also drop a trailing 00 00 03 at end-of-payload (cabac_zero_words
    // style patterns keep the trailing byte, so only skip when followed
    // by <= 0x03 per spec; a final 03 with nothing after is part of data).
    out.push_back(b);
    zeros = (b == 0) ? zeros + 1 : 0;
  }
  return out;
}

std::vector<u8> rbsp_to_ebsp(const std::vector<u8>& rbsp) {
  std::vector<u8> out;
  out.reserve(rbsp.size() + rbsp.size() / 64 + 8);
  int zeros = 0;
  for (size_t i = 0; i < rbsp.size(); ++i) {
    u8 b = rbsp[i];
    if (zeros >= 2 && b <= 0x03) {
      out.push_back(0x03);
      zeros = 0;
    }
    out.push_back(b);
    zeros = (b == 0) ? zeros + 1 : 0;
  }
  return out;
}

void put_varint(std::vector<u8>& out, u64 v) {
  while (v >= 0x80) {
    out.push_back(u8(v) | 0x80);
    v >>= 7;
  }
  out.push_back(u8(v));
}

u64 get_varint(const u8* data, size_t size, size_t* pos) {
  u64 v = 0;
  int shift = 0;
  while (true) {
    PIP_CHECK(*pos < size, "varint overrun");
    u8 b = data[(*pos)++];
    v |= u64(b & 0x7f) << shift;
    if (!(b & 0x80)) break;
    shift += 7;
    PIP_CHECK(shift < 64, "varint too long");
  }
  return v;
}

}  // namespace h264pip
