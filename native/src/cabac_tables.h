#pragma once
#include "common.h"

namespace h264pip {

extern const i8 kCabacCtxInit[460][4][2];
extern const u8 kCabacRangeLps[64][4];
extern const u8 kCabacStateTrans[64][2];
extern const u8 kSigCtx8x8[64];
extern const u8 kLastCtx8x8[64];

// Standard ctxIdx offsets (ISO 14496-10 Table 9-11)
enum CabacCtxOffset {
  CTX_MB_TYPE_I = 3,
  CTX_MB_SKIP_P = 11,
  CTX_MB_TYPE_P = 14,       // P mb_type prefix bins live at 14..20
  CTX_SUB_MB_P = 21,
  CTX_MVD_X = 40,
  CTX_MVD_Y = 47,
  CTX_REF_IDX = 54,
  CTX_DQP = 60,
  CTX_CHROMA_MODE = 64,
  CTX_IPRED_FLAG = 68,
  CTX_IPRED_REM = 69,
  CTX_CBP_LUMA = 73,
  CTX_CBP_CHROMA = 77,      // bin0 77..80, bin1 81..84
  CTX_CBF = 85,             // + cat offset {0,4,8,12,16}
  CTX_SIG = 105,            // + cat offset {0,15,29,44,47}
  CTX_LAST = 166,
  CTX_ONE = 227,            // + cat offset {0,10,20,30,39}
  CTX_ABS = 232,            // = CTX_ONE + 5 within each cat block
  CTX_T8X8 = 399,
  CTX_SIG_8X8 = 402,
  CTX_LAST_8X8 = 417,
  CTX_ONE_8X8 = 426,
  CTX_ABS_8X8 = 431,
};

}  // namespace h264pip
