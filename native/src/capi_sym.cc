// C API for the symbol-plane decoder (ctypes; consumed by
// losslessh264_tpu/decoder.py).
#include "decsupport.h"

#include <cstring>

using namespace h264pip;

namespace {
struct SymHandle {
  SymbolDecoder dec;
  FramePlanes cur;
  SymHandle(const u8* d, size_t n) : dec(d, n) {}
};
void set_err(char* err, size_t cap, const char* msg) {
  if (err && cap) {
    strncpy(err, msg, cap - 1);
    err[cap - 1] = 0;
  }
}
}  // namespace

extern "C" {

void* pip_sym_open(const u8* data, size_t size, char* err, size_t err_cap) {
  try {
    return new SymHandle(data, size);
  } catch (const std::exception& e) {
    set_err(err, err_cap, e.what());
    return nullptr;
  }
}

void pip_sym_close(void* h) { delete static_cast<SymHandle*>(h); }

// Advance to the next frame. Returns 1 (frame ready), 0 (end), -1 (error).
int pip_sym_next(void* hv, int* mb_w, int* mb_h, char* err, size_t err_cap) {
  SymHandle* h = static_cast<SymHandle*>(hv);
  try {
    h->cur = FramePlanes();
    if (!h->dec.next_frame(&h->cur)) return 0;
    *mb_w = h->cur.mb_w;
    *mb_h = h->cur.mb_h;
    return 1;
  } catch (const std::exception& e) {
    set_err(err, err_cap, e.what());
    return -1;
  }
}

// Copy the current frame's planes into caller-provided buffers (sized for
// mb_w*mb_h MBs as returned by pip_sym_next).
int pip_sym_planes(void* hv, u8* mb_class, u8* qp, u8* cbp_l, u8* cbp_c,
                   u8* t8, u8* i16m, u8* cmode, i8* i4m, i16* luma_ac,
                   i16* luma_dc, i16* luma8, i16* chroma_ac, i16* chroma_dc,
                   i16* mv, i16* ref_frame, u8* pcm, u8* slice_id,
                   u8* deblock_idc, i8* aoff, i8* boff, i32* meta,
                   u8* scaling, i16* wp_luma, i16* wp_cb, i16* wp_cr,
                   u8* wp_cmask, i8* ref_idx, u8* decoded, u8* part_tl,
                   i32* ref_list, i32* dpb_live) {
  SymHandle* h = static_cast<SymHandle*>(hv);
  const FramePlanes& f = h->cur;
  size_t n = size_t(f.mb_w) * f.mb_h;
  if (n == 0) return -1;
  memcpy(mb_class, f.mb_class.data(), n);
  memcpy(qp, f.qp.data(), n);
  memcpy(cbp_l, f.cbp_luma.data(), n);
  memcpy(cbp_c, f.cbp_chroma.data(), n);
  memcpy(t8, f.transform8.data(), n);
  memcpy(i16m, f.i16_mode.data(), n);
  memcpy(cmode, f.chroma_mode.data(), n);
  memcpy(i4m, f.i4_modes.data(), n * 16);
  memcpy(luma_ac, f.luma_ac.data(), n * 256 * 2);
  memcpy(luma_dc, f.luma_dc.data(), n * 16 * 2);
  memcpy(luma8, f.luma8.data(), n * 256 * 2);
  memcpy(chroma_ac, f.chroma_ac.data(), n * 128 * 2);
  memcpy(chroma_dc, f.chroma_dc.data(), n * 8 * 2);
  memcpy(mv, f.mv.data(), n * 32 * 2);
  memcpy(ref_frame, f.ref_frame.data(), n * 16 * 2);
  memcpy(pcm, f.pcm.data(), n * 384);
  memcpy(slice_id, f.slice_id.data(), n);
  memcpy(deblock_idc, f.deblock_idc.data(), n);
  memcpy(aoff, f.alpha_off.data(), n);
  memcpy(boff, f.beta_off.data(), n);
  meta[0] = f.use_scaling ? 1 : 0;
  meta[1] = f.chroma_qp_offset;
  meta[2] = f.second_chroma_qp_offset;
  meta[3] = f.is_ref ? 1 : 0;
  meta[4] = f.is_idr ? 1 : 0;
  meta[5] = f.intra_avail_mode;
  for (int i = 0; i < 4; ++i) meta[6 + i] = f.crop[i];
  meta[10] = f.lost_slices;
  memcpy(scaling, f.scaling4, 6 * 16);
  memcpy(scaling + 96, f.scaling8, 6 * 64);
  memcpy(wp_luma, f.wp_luma.data(), n * 48 * 2);
  memcpy(wp_cb, f.wp_cb.data(), n * 48 * 2);
  memcpy(wp_cr, f.wp_cr.data(), n * 48 * 2);
  memcpy(wp_cmask, f.wp_cmask.data(), n * 64);
  memcpy(ref_idx, f.ref_idx.data(), n * 16);
  memcpy(decoded, f.decoded.data(), n);
  part_tl[0] = 0;  // ensure defined even for n*16 == 0 (never happens)
  memcpy(part_tl, f.part_tl.data(), n * 16);
  ref_list[0] = f.n_ref_list;
  memcpy(ref_list + 1, f.ref_list, sizeof(f.ref_list));
  dpb_live[0] = f.n_dpb_live;
  memcpy(dpb_live + 1, f.dpb_live, sizeof(f.dpb_live));
  return 0;
}

}  // extern "C"
