// Static coding tables from ISO 14496-10 (scan orders, CAVLC VLC tables,
// CBP me(v) mappings). These are spec constants; every H.264 codec carries
// identical numbers (reference: encoder_data_tables.cpp,
// decoder_data_tables.cpp, common_tables.cpp).
#pragma once

#include "common.h"

namespace h264pip {

// zigzag scan: scan position -> raster position (4x4 / 8x8, frame coding)
extern const u8 kZz4[16];
extern const u8 kZz8[64];
// inverse: raster position -> scan position
extern const u8 kZz4Inv[16];
extern const u8 kZz8Inv[64];

// coeff_token encode: [nc_class][total_coeff][trailing_ones] -> {value,len}.
// nc_class: 0: 0<=nC<2, 1: 2<=nC<4, 2: 4<=nC<8, 3: nC>=8 (FLC), 4: nC==-1.
struct VlcCode {
  u8 val;
  u8 len;
};
extern const VlcCode kCoeffToken[5][17][4];
int nc_class(int nC);  // maps nC to table class

// total_zeros: [total_coeff(1..15)][total_zeros] -> {value,len}
extern const VlcCode kTotalZeros[16][16];
// chroma DC (4:2:0) total_zeros: [total_coeff(1..3)][total_zeros]
extern const VlcCode kTotalZerosChromaDc[4][4];
// run_before: [min(zeros_left,7)][run] -> {value,len}
extern const VlcCode kRunBefore[8][15];

// CBP me(v) mapping (Table 9-4): codeNum -> cbp and inverse.
extern const u8 kCbpIntra[48];      // chroma_format != 0
extern const u8 kCbpInter[48];
extern const u8 kCbpIntra400[16];
extern const u8 kCbpInter400[16];
int cbp_to_code(int cbp, bool intra, bool mono);  // inverse lookup

// Generic VLC decoder over an encode table: finds the unique codeword
// matching the upcoming bits. Returns symbol index; advances the reader.
class BitReader;

// 4x4 block index (0..15, raster-in-MB "luma4x4BlkIdx" decode order) to
// x,y in units of 4 pixels. H.264 uses the "zig" 2x2-of-2x2 decode order.
extern const u8 kBlk4x4DecodeOrder[16];   // decode order index -> raster idx
extern const u8 kBlk4x4DecodeOrderInv[16];

}  // namespace h264pip
