// CAVLC macroblock + residual parse/write (ISO 14496-10 §7.3.5, §9.1-9.2).
// Reference parity: parse_mb_syn_cavlc.cpp (decode side),
// svc_set_mb_syn_cavlc.cpp + set_mb_syn_cavlc.cpp (write side).
#pragma once

#include "bitio.h"
#include "state.h"

namespace h264pip {

// Residual block: coeff[] has maxNumCoeff entries in scan order. Returns
// total_coeff. nC: CAVLC context (-1 for chroma DC 4:2:0). When `bench`
// is non-null, the original bits consumed are billed there: coeff_token
// under tag_nz, level codes under tag_lvl, total_zeros+run_before under
// tag_run (reference: the CAVLC cost split, parse_mb_syn_cavlc.cpp:640-652).
int cavlc_parse_residual(BitReader& br, int nC, int maxNumCoeff, i16* coeff,
                         double* bench = nullptr, int tag_nz = 0,
                         int tag_lvl = 0, int tag_run = 0);
void cavlc_write_residual(BitWriter& bw, int nC, int maxNumCoeff,
                          const i16* coeff);

// Parse/write one coded (non-skip) macroblock, starting at mb_type.
// Updates ctx.cur (nnz etc.) during the scan; caller must ctx.begin_mb()
// first and ctx.commit(rec) + apply dqp afterwards.
void parse_mb_cavlc(BitReader& br, SliceCtx& ctx, MbRecord& rec);
void write_mb_cavlc(BitWriter& bw, SliceCtx& ctx, const MbRecord& rec);

}  // namespace h264pip
