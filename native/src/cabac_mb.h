// CABAC slice-data codec: parse (decode) and bit-exact re-encode of
// macroblock layers, sharing one templated bin-level body.
//
// Reference parity: parse_mb_syn_cabac.cpp + WelsDecodeMbCabacISlice/
// PSlice (decode_slice.cpp:688-1164) on the decode side, and
// svc_set_mb_syn_cabac.cpp (the writer the reference's recode path drives)
// on the encode side. Clean-room per ISO 14496-10 §9.3.
#pragma once

#include "cabac.h"
#include "state.h"

namespace h264pip {

struct CabacSliceParse {
  std::vector<MbRecord> recs;  // decode order; includes PSKIP entries
  size_t end_byte = 0;         // bytes of rbsp consumed by the slice
};

// Parse a CABAC slice's data. `rbsp` is the full slice RBSP; data starts
// byte-aligned after sh.header_bits (+ cabac_alignment_one_bits).
// Commits each MB to sc.pic as it goes.
CabacSliceParse cabac_parse_slice(const std::vector<u8>& rbsp, SliceCtx& sc,
                                  const SliceHeader& sh);

// Synthesize the slice RBSP (header bits + alignment + CABAC data) from
// records. Commits each MB to sc.pic as it goes.
std::vector<u8> cabac_write_slice(const std::vector<MbRecord>& recs,
                                  SliceCtx& sc, const SliceHeader& sh,
                                  const u8* hdr_bytes, size_t header_bits);

}  // namespace h264pip
