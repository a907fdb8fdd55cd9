#include "engine.h"

#include "bitio.h"
#include "cabac_mb.h"
#include "cavlc.h"
#include "model.h"

#include <memory>
#include <thread>

namespace h264pip {

// Container format / model revision. Bump whenever the prior layout or
// any coding decision changes (ADVICE r3: a stale .pip from an older
// model otherwise fails later with a misleading reconstruction-CRC
// error instead of a clear version mismatch). History: 1 = rounds 1-3.
static const u8 kPipVersion = 2;

u8 pip_container_version() { return kPipVersion; }

// ---------------------------------------------------------------------------
// Annex-B scanning
// ---------------------------------------------------------------------------
struct NalSpan {
  size_t prefix_start;   // first byte of leading zeros + start code
  size_t payload_start;  // first byte after 00 00 01
  size_t payload_end;
};

// leading_end: when non-null, bytes [0, *leading_end) that precede the
// first start code (or the whole input when none exists) are reported to
// the caller for verbatim RAW passthrough instead of failing — the
// lossless contract must hold for arbitrary byte strings. When null the
// scan is strict (used for the SPS/PPS context framing we emit ourselves).
static std::vector<NalSpan> scan_annexb(const u8* d, size_t n,
                                        size_t* trailing_start,
                                        size_t* leading_end = nullptr) {
  std::vector<NalSpan> out;
  *trailing_start = n;
  // find all start codes
  size_t i = 0;
  size_t prev_payload_open = 0;  // start of region before first NAL
  std::vector<size_t> sc_pos;    // position of the 00 00 01 triplet
  while (i + 2 < n) {
    if (d[i] == 0 && d[i + 1] == 0 && d[i + 2] == 1) {
      sc_pos.push_back(i);
      i += 3;
    } else if (d[i + 2] > 1) {
      i += 3;
    } else {
      ++i;
    }
  }
  if (leading_end) *leading_end = 0;
  if (sc_pos.empty()) {
    PIP_CHECK(leading_end != nullptr, "no start code found");
    *leading_end = n;
    *trailing_start = n;
    return {};
  }
  for (size_t k = 0; k < sc_pos.size(); ++k) {
    NalSpan s;
    size_t q = sc_pos[k];
    // leading zeros belong to this unit's prefix
    size_t z = q;
    while (z > prev_payload_open && d[z - 1] == 0) --z;
    s.prefix_start = z;
    s.payload_start = q + 3;
    if (k + 1 < sc_pos.size()) {
      size_t q2 = sc_pos[k + 1];
      size_t z2 = q2;
      while (z2 > s.payload_start && d[z2 - 1] == 0) --z2;
      s.payload_end = z2;
    } else {
      // last unit: trailing zeros at EOF split into a trailing record
      size_t e = n;
      while (e > s.payload_start && d[e - 1] == 0) --e;
      s.payload_end = e;
      *trailing_start = e;
    }
    if (k == 0 && s.prefix_start != prev_payload_open && leading_end) {
      // nonzero junk before the first start code: RAW passthrough
      *leading_end = s.prefix_start;
      prev_payload_open = s.prefix_start;
    }
    PIP_CHECK(s.prefix_start == (k == 0 ? prev_payload_open : out.back().payload_end),
              "annexb gap not zeros");
    for (size_t j = s.prefix_start; j < q; ++j)
      PIP_CHECK(d[j] == 0, "nonzero byte in start-code prefix");
    prev_payload_open = s.payload_end;
    out.push_back(s);
  }
  return out;
}

// ---------------------------------------------------------------------------
// Container records
// ---------------------------------------------------------------------------
enum RecType : u8 { REC_RAW = 0, REC_SLICE = 1, REC_END = 2, REC_SLICE_TAIL = 3 };

// CRC-32 (IEEE) of the original stream, stored in the container header so
// decompress always verifies integrity end-to-end.
static u32 crc32_ieee(const u8* data, size_t n) {
  static u32 table[256];
  static bool init = false;
  if (!init) {
    for (u32 i = 0; i < 256; ++i) {
      u32 c = i;
      for (int k = 0; k < 8; ++k) c = (c & 1) ? 0xEDB88320u ^ (c >> 1) : c >> 1;
      table[i] = c;
    }
    init = true;
  }
  u32 c = 0xFFFFFFFFu;
  for (size_t i = 0; i < n; ++i) c = table[(c ^ data[i]) & 0xFF] ^ (c >> 8);
  return c ^ 0xFFFFFFFFu;
}

// ---------------------------------------------------------------------------
// Picture-boundary detection (7.4.1.2.4), shared by both directions.
// ---------------------------------------------------------------------------
static bool is_new_picture(const SliceHeader* prev, const SliceHeader& cur) {
  if (!prev) return true;
  if (prev->frame_num != cur.frame_num) return true;
  if (prev->pps_id != cur.pps_id) return true;
  if (prev->field_pic != cur.field_pic) return true;
  if ((prev->nal_ref_idc == 0) != (cur.nal_ref_idc == 0)) return true;
  if (prev->is_idr != cur.is_idr) return true;
  if (cur.is_idr && prev->idr_pic_id != cur.idr_pic_id) return true;
  if (prev->poc_lsb != cur.poc_lsb ||
      prev->delta_poc_bottom != cur.delta_poc_bottom)
    return true;
  if (prev->delta_poc[0] != cur.delta_poc[0] ||
      prev->delta_poc[1] != cur.delta_poc[1])
    return true;
  if (prev->redundant_pic_cnt != cur.redundant_pic_cnt) return true;
  // first_mb_in_slice going backwards (or repeating 0) implies a new pic
  if (cur.first_mb_in_slice <= prev->first_mb_in_slice) return true;
  return false;
}

// ---------------------------------------------------------------------------
// Shared stream-walking state
// ---------------------------------------------------------------------------
struct WalkState {
  std::map<int, Sps> sps_map;
  std::map<int, Pps> pps_map;
  SliceHeader prev_sh;
  bool have_prev_vcl = false;
  PicState pic;
  FreqImage fi;
  // Per-resolution parked FreqImages: a resolution switch stashes the
  // current temporal-prior state and restores the one for the new size,
  // so streams interleaving several resolutions (spatial simulcast
  // layers) keep their PAST priors per layer instead of resetting every
  // frame (the reference invalidates on any switch,
  // decode_slice.cpp:3035-3046 — pure modeling state, identical on both
  // walks, so the roundtrip contract is unaffected).
  std::map<long long, FreqImage> fi_pool;
  std::unique_ptr<Model> model{new Model()};
  u64 n_frames = 0;

  // Returns true if this slice starts a new picture; updates pic/fi.
  bool on_slice_header(const Sps& sps, const Pps& pps, const SliceHeader& sh) {
    bool newpic = is_new_picture(have_prev_vcl ? &prev_sh : nullptr, sh);
    if (newpic) {
      int w = sps.mb_width(), h = sps.mb_height();
      if (fi.w != w || fi.h != h) {
        if (fi.w)
          fi_pool[(long long)fi.w << 20 | fi.h] = std::move(fi);
        auto it = fi_pool.find((long long)w << 20 | h);
        if (it != fi_pool.end()) {
          fi = std::move(it->second);
          fi_pool.erase(it);
          fi.advance_frame();
        } else {
          fi.reset(w, h);
        }
      } else {
        fi.advance_frame();
      }
      pic.reset(w, h);
      ++n_frames;
    }
    prev_sh = sh;
    have_prev_vcl = true;
    return newpic;
  }
};

static bool nal_is_vcl(int type) { return type >= 1 && type <= 5; }

const char* bill_tag_name(int tag) {
  static const char* kNames[BILL_NUM] = {
      "mb_type",      "skip",        "end",         "cbp",
      "cbp_luma",     "cbp_chroma",  "qp_delta",    "i4_mode",
      "i8_mode",      "i16_mode",    "chroma_mode", "sub_mb",
      "ref_idx",      "mvd_x",       "mvd_y",       "t8x8_flag",
      "luma_dc",      "chroma_dc",   "luma_nz",     "luma_ac",
      "luma_run",     "chroma_nz",   "chroma_ac",   "chroma_run",
      "pcm",          "startcode",   "nal_hdr",     "param_set",
      "slice_hdr",    "trailing",    "raw_fallback", "container",
      "other",        "luma_ac_sign", "luma_ac_mag",
      "cabac_cbf",    "cabac_sig",   "cabac_last",  "cabac_sign",
      "mvd_sub_x",    "mvd_sub_y",   "chroma_ac_sign",
      "chroma_ac_mag"};
  return (tag >= 0 && tag < BILL_NUM) ? kNames[tag] : "?";
}

// Parse SPS/PPS out of a non-VCL NAL payload (used by both directions).
// Corrupt parameter sets are skipped, identically on compress and
// decompress, so both walks stay state-mirrored; slices referencing a
// skipped set then fail their support pre-check and pass through raw.
static void absorb_nal(WalkState& ws, const u8* payload, size_t len) {
  if (len == 0) return;
  int type = payload[0] & 0x1f;
  try {
    if (type == 7) {
      std::vector<u8> rbsp = ebsp_to_rbsp(payload + 1, len - 1);
      BitReader br(rbsp.data(), rbsp.size());
      Sps sps = parse_sps(br);
      ws.sps_map[sps.sps_id] = sps;
    } else if (type == 8) {
      std::vector<u8> rbsp = ebsp_to_rbsp(payload + 1, len - 1);
      BitReader br(rbsp.data(), rbsp.size());
      Pps pps = parse_pps(br, ws.sps_map);
      ws.pps_map[pps.pps_id] = pps;
    }
  } catch (const PipError&) {
  }
}

// ---------------------------------------------------------------------------
// Slice symbol streams (CAVLC). One templated body handles:
//  - compress: IO=StreamWriter, parse_bits=true  (reads br, emits symbols)
//  - recode:   IO=StreamReader, parse_bits=false (scans symbols, writes bw)
// The replay-verify pass at compress time runs the recode body.
// ---------------------------------------------------------------------------

struct SliceResult {
  std::vector<u8> rbsp;  // recode: synthesized full RBSP (header+data+trailing)
  int n_mbs = 0;
};

// CAVLC compress, pass 1: decode every MB of the slice into records
// WITHOUT touching the model, the output streams, or the FreqImage
// (PicState mutations are rolled back by the caller's snapshot). This
// makes corrupt/undecodable slice data recoverable: the caller falls
// back to raw passthrough of the NAL, the in-domain analog of the
// reference decoder's error-resilience paths (error_concealment.cpp,
// dsBitstreamError handling in decode_slice.cpp:2984-2992).
static std::vector<MbRecord> cavlc_parse_slice(WalkState& ws, const Sps& sps,
                                               const Pps& pps,
                                               const SliceHeader& sh,
                                               const std::vector<u8>& rbsp,
                                               double* bench = nullptr) {
  SliceCtx sc;
  sc.begin_slice(&sps, &pps, &sh, &ws.pic);
  compute_slice_group_map(sps, pps, sh, ws.pic);
  sc.bench = bench;
  BitReader br(rbsp.data(), rbsp.size());
  br.seek_bits(sh.header_bits);
  std::vector<MbRecord> recs;
  int addr = sh.first_mb_in_slice;
  bool isP = (sh.slice_type == SLICE_P || sh.slice_type == SLICE_SP);
  while (true) {
    PIP_CHECK(addr < ws.pic.num_mbs(), "slice overruns picture");
    if (isP) {
      size_t sp0 = br.pos_bits();
      int run = int(br.ue());
      if (bench) bench[BILL_SKIP] += double(br.pos_bits() - sp0);
      for (int k = 0; k < run; ++k) {
        PIP_CHECK(addr < ws.pic.num_mbs(), "skip run overruns picture");
        sc.begin_mb(addr);
        MbRecord skip;
        skip.mb_class = MB_PSKIP;
        skip.qp = u8(sc.cur_qp);
        sc.commit(skip);
        recs.push_back(skip);
        addr = next_mb_address(ws.pic, addr);
      }
      if (run > 0 && !br.more_rbsp_data()) break;
    }
    sc.begin_mb(addr);
    MbRecord rec;
    parse_mb_cavlc(br, sc, rec);
    if (rec.cbp_luma != 0 || rec.cbp_chroma != 0 || rec.mb_class == MB_I16x16)
      sc.apply_dqp(rec.dqp);
    else
      sc.last_dqp = 0;
    rec.qp = u8(sc.cur_qp);
    sc.commit(rec);
    recs.push_back(rec);
    addr = next_mb_address(ws.pic, addr);
    if (!br.more_rbsp_data()) break;
  }
  return recs;
}

// CAVLC compress, pass 2: emit model symbols from the parsed records.
// Emission order is identical to the original single-pass walk (skip
// run, end bit after nonzero runs, MB symbols, end bit); maximal
// consecutive-PSKIP runs reconstruct the coded skip runs exactly.
static void cavlc_model_slice(StreamWriter& io, WalkState& ws,
                              const Sps& sps, const Pps& pps,
                              const SliceHeader& sh,
                              const std::vector<MbRecord>& recs,
                              EngineStats* stats) {
  SliceCtx sc;
  sc.begin_slice(&sps, &pps, &sh, &ws.pic);
  compute_slice_group_map(sps, pps, sh, ws.pic);
  ModelCtx mc;
  mc.M = ws.model.get();
  mc.fi = &ws.fi;
  mc.sc = &sc;
  mc.slice_is_p = (sh.slice_type == SLICE_P || sh.slice_type == SLICE_SP) ? 1 : 0;

  int addr = sh.first_mb_in_slice;
  int w = ws.pic.mb_width;
  int mb_index = 0;
  bool isP = mc.slice_is_p != 0;
  size_t k = 0;
  while (true) {
    if (isP) {
      int run = 0;
      while (k + run < recs.size() && recs[k + run].mb_class == MB_PSKIP)
        ++run;
      code_skip_run(io, *ws.model, ws.fi, addr % w, addr / w, run);
      for (int i = 0; i < run; ++i) {
        sc.begin_mb(addr);
        MbRecord skip = recs[k++];
        sc.commit(skip);
        ws.fi.store(addr % w, addr / w, skip);
        addr = next_mb_address(ws.pic, addr);
        ++mb_index;
      }
      if (run > 0) {
        // addr already points at the NEXT uncoded MB (the skip loop
        // advanced it): end is deterministic iff the walk is exhausted
        bool end = (k == recs.size());
        code_end_bit(io, *ws.model, mb_index, ws.pic.num_mbs() - addr,
                     addr >= ws.pic.num_mbs(), /*after_skip=*/true, end);
        if (end) break;
      }
    }
    // coded MB
    sc.begin_mb(addr);
    MbRecord rec = recs[k++];
    mc.at(addr % w, addr / w, mb_index, &rec);
    code_mb_symbols(io, mc);
    if (rec.cbp_luma != 0 || rec.cbp_chroma != 0 || rec.mb_class == MB_I16x16)
      sc.apply_dqp(rec.dqp);
    else
      sc.last_dqp = 0;
    sc.commit(rec);
    ws.fi.store(addr % w, addr / w, rec);
    ++mb_index;
    if (stats) ++stats->n_mbs;
    bool end = (k == recs.size());
    int nxt = next_mb_address(ws.pic, addr);
    code_end_bit(io, *ws.model, mb_index, ws.pic.num_mbs() - 1 - addr,
                 nxt >= ws.pic.num_mbs(), /*after_skip=*/false, end);
    addr = nxt;
    if (end) break;
  }
}

// Model-symbol pass for CABAC slices: one MB record per symbol group
// (PSKIP entries included), end bit after each. Shared by compress
// (IO=StreamWriter, records given) and recode (IO=StreamReader, records
// produced). Commits model-level MB state; stores records into FreqImage.
template <class IO>
static void cabac_model_slice(IO& io, WalkState& ws, const Sps& sps,
                              const Pps& pps, const SliceHeader& sh,
                              std::vector<MbRecord>* recs) {
  SliceCtx sc;
  sc.begin_slice(&sps, &pps, &sh, &ws.pic);
  compute_slice_group_map(sps, pps, sh, ws.pic);
  ModelCtx mc;
  mc.M = ws.model.get();
  mc.fi = &ws.fi;
  mc.sc = &sc;
  mc.slice_is_p = (sh.slice_type == SLICE_P || sh.slice_type == SLICE_SP) ? 1 : 0;

  int addr = sh.first_mb_in_slice;
  int w = ws.pic.mb_width;
  size_t k = 0;
  while (true) {
    PIP_CHECK(addr < ws.pic.num_mbs(), "cabac model slice overruns picture");
    sc.begin_mb(addr);
    MbRecord local;
    MbRecord* rec;
    if (IO::kIsWriter) {
      PIP_CHECK(k < recs->size(), "cabac model record underrun");
      rec = &(*recs)[k];
    } else {
      local = MbRecord();
      rec = &local;
    }
    mc.at(addr % w, addr / w, int(k), rec);
    code_mb_symbols(io, mc);
    bool has_dqp = rec->cbp_luma != 0 || rec->cbp_chroma != 0 ||
                   rec->mb_class == MB_I16x16;
    if (has_dqp)
      sc.apply_dqp(rec->dqp);
    else
      sc.last_dqp = 0;
    rec->qp = u8(sc.cur_qp);
    sc.commit(*rec);
    ws.fi.store(addr % w, addr / w, *rec);
    if (!IO::kIsWriter) recs->push_back(*rec);
    ++k;
    int nxt = next_mb_address(ws.pic, addr);
    bool end = code_end_bit(io, *ws.model, int(k),
                            ws.pic.num_mbs() - 1 - addr,
                            nxt >= ws.pic.num_mbs(), /*after_skip=*/false,
                            IO::kIsWriter ? (k == recs->size()) : false);
    addr = nxt;
    if (end) break;
  }
}

// Recode direction: scan model symbols, synthesize the slice RBSP.
static std::vector<u8> recode_slice_cavlc(StreamReader& io, WalkState& ws,
                                          const Sps& sps, const Pps& pps,
                                          const SliceHeader& sh,
                                          const u8* header_bytes,
                                          size_t header_bits) {
  SliceCtx sc;
  sc.begin_slice(&sps, &pps, &sh, &ws.pic);
  compute_slice_group_map(sps, pps, sh, ws.pic);
  ModelCtx mc;
  mc.M = ws.model.get();
  mc.fi = &ws.fi;
  mc.sc = &sc;
  mc.slice_is_p = (sh.slice_type == SLICE_P || sh.slice_type == SLICE_SP) ? 1 : 0;

  BitWriter bw;
  bw.append_bits(header_bytes, 0, header_bits);

  int addr = sh.first_mb_in_slice;
  int w = ws.pic.mb_width;
  int mb_index = 0;
  bool isP = mc.slice_is_p != 0;
  while (true) {
    PIP_CHECK(addr < ws.pic.num_mbs(), "recode slice overruns picture");
    if (isP) {
      int run = code_skip_run(io, *ws.model, ws.fi, addr % w, addr / w, 0);
      bw.put_ue(u32(run));
      for (int k = 0; k < run; ++k) {
        sc.begin_mb(addr);
        MbRecord skip;
        skip.mb_class = MB_PSKIP;
        skip.qp = u8(sc.cur_qp);
        sc.commit(skip);
        ws.fi.store(addr % w, addr / w, skip);
        addr = next_mb_address(ws.pic, addr);
        ++mb_index;
      }
      if (run > 0) {
        bool end = code_end_bit(io, *ws.model, mb_index,
                                ws.pic.num_mbs() - addr,
                                addr >= ws.pic.num_mbs(), true, false);
        if (end) break;
      }
    }
    sc.begin_mb(addr);
    MbRecord rec;
    mc.at(addr % w, addr / w, mb_index, &rec);
    code_mb_symbols(io, mc);
    derive_nnz(rec);
    write_mb_cavlc(bw, sc, rec);
    if (rec.cbp_luma != 0 || rec.cbp_chroma != 0 || rec.mb_class == MB_I16x16)
      sc.apply_dqp(rec.dqp);
    else
      sc.last_dqp = 0;
    rec.qp = u8(sc.cur_qp);
    sc.commit(rec);
    ws.fi.store(addr % w, addr / w, rec);
    ++mb_index;
    int nxt = next_mb_address(ws.pic, addr);
    bool end = code_end_bit(io, *ws.model, mb_index,
                            ws.pic.num_mbs() - 1 - addr,
                            nxt >= ws.pic.num_mbs(), false, false);
    addr = nxt;
    if (end) break;
  }
  bw.rbsp_trailing_bits();
  return bw.take();
}

// ---------------------------------------------------------------------------
// Compress driver
// ---------------------------------------------------------------------------
std::vector<u8> pip_compress(const u8* data, size_t size, bool verify,
                             EngineStats* stats, const u8* context,
                             size_t context_size) {
  size_t trailing_start = size;
  size_t leading_end = 0;
  std::vector<NalSpan> nals =
      scan_annexb(data, size, &trailing_start, &leading_end);

  std::vector<u8> def;  // default stream
  StreamWriter io;
  // Dual billing ledgers (reference: bill[] original-side vs
  // pip_decisions[] ours-side, billing.h / compression_stream.cpp):
  // ours_arith = arithmetic-stream bits per tag; ours_def = default-stream
  // + container bits per tag. Their sum is EXACTLY 8x the output size;
  // stats->bench_bits sums to EXACTLY 8x the input size (tested).
  double ours_arith[BILL_NUM] = {};
  double ours_def[BILL_NUM] = {};
  if (stats) {
    io.bill = ours_arith;
    if (getenv("PIP_PRIOR_STATS")) {
      io.prior_total = stats->prior_total;
      io.prior_hits = stats->prior_hits;
    }
  }
  auto bill_def = [&](int tag, double bits) {
    if (stats) ours_def[tag] += bits;
  };
  auto bill_bench = [&](int tag, double bits) {
    if (stats) stats->bench_bits[tag] += bits;
  };
  WalkState ws;
  if (context && context_size) {
    size_t cts = context_size;
    for (const NalSpan& s : scan_annexb(context, context_size, &cts)) {
      absorb_nal(ws, context + s.payload_start,
                 s.payload_end - s.payload_start);
    }
  }
  // Verification replays the recode path; it needs an independent walk
  // state + reader fed by a snapshot of the writer. We instead verify per
  // slice by re-running the writer-side state transition: the recode body
  // with a fresh reader over the bits emitted so far is not available
  // (single stream), so verification re-synthesizes from the parsed
  // records. Simpler: run a full second WalkState through a recode pass
  // at the end when `verify` is set (see below) — that exercises the
  // exact decompress path.

  // One REC_RAW per span (decompress scans for the start code INSIDE a
  // record to mirror bookkeeping — never split a NAL across records).
  // Payload bits are billed by the caller; framing goes to CONTAINER.
  auto emit_raw = [&](const u8* p, size_t n, int tag) {
    if (n == 0) return;
    size_t before = def.size();
    def.push_back(REC_RAW);
    put_varint(def, n);
    bill_def(BILL_CONTAINER, double(def.size() - before) * 8);
    def.insert(def.end(), p, p + n);
    bill_def(tag, double(n) * 8);
  };

  // pre-start-code junk: verbatim
  emit_raw(data, leading_end, BILL_OTHER);
  bill_bench(BILL_OTHER, double(leading_end) * 8);

  for (const NalSpan& s : nals) {
    const u8* payload = data + s.payload_start;
    size_t plen = s.payload_end - s.payload_start;
    size_t prefix_len = s.payload_start - s.prefix_start;
    if (stats) ++stats->n_nals;
    if (plen == 0) {  // bare start code at EOF region: verbatim
      emit_raw(data + s.prefix_start, s.payload_end - s.prefix_start,
               BILL_STARTCODE);
      bill_bench(BILL_STARTCODE, double(s.payload_end - s.prefix_start) * 8);
      continue;
    }
    int nal_type = payload[0] & 0x1f;
    int nal_ref_idc = (payload[0] >> 5) & 3;

    bool modeled = false;
    bool did_bookkeeping = false;
    if (nal_is_vcl(nal_type) && (nal_type == 1 || nal_type == 5)) {
      // Pre-check support WITHOUT touching model/stream state; once a
      // slice starts being modeled, failures are fatal (a mid-slice
      // fallback would desynchronize the adaptive coder).
      std::vector<u8> rbsp;
      SliceHeader sh;
      bool supported = false;
      try {
        rbsp = ebsp_to_rbsp(payload + 1, plen - 1);
        {
          std::vector<u8> back = rbsp_to_ebsp(rbsp);
          PIP_CHECK(back.size() == plen - 1 &&
                        memcmp(back.data(), payload + 1, plen - 1) == 0,
                    "non-canonical escaping");
        }
        BitReader hbr(rbsp.data(), rbsp.size());
        sh = parse_slice_header(hbr, nal_ref_idc, nal_type, ws.sps_map,
                                ws.pps_map);
        const Pps& pps = ws.pps_map.at(sh.pps_id);
        const Sps& sps = ws.sps_map.at(pps.sps_id);
        PIP_CHECK(sh.slice_type == SLICE_P || sh.slice_type == SLICE_I,
                  "slice type not yet modeled");
        PIP_CHECK(sps.chroma_format_idc == 1 || sps.chroma_format_idc == 0,
                  "chroma format not supported");
        PIP_CHECK(sps.bit_depth_luma == 8 && sps.bit_depth_chroma == 8,
                  "bit depth not supported");
        PIP_CHECK(sh.redundant_pic_cnt == 0, "redundant slices not modeled");
        supported = true;
      } catch (const PipError&) {
        supported = false;
      }
      if (supported) {
        const Pps& pps = ws.pps_map.at(sh.pps_id);
        const Sps& sps = ws.sps_map.at(pps.sps_id);
        ws.on_slice_header(sps, pps, sh);
        did_bookkeeping = true;
        std::vector<u8> trailing;
        size_t drop = 0;  // synth bytes replaced by verbatim trailing
        // per-NAL bench ledger, merged only when the slice models OK
        double nal_bench[BILL_NUM] = {};
        double* nb = stats ? nal_bench : nullptr;
        if (!pps.entropy_coding_mode) {
          // 2-pass: parse on a PicState snapshot (rollback + raw
          // fallback on corrupt slice data), then model-emit.
          PicState snapshot = ws.pic;
          std::vector<MbRecord> recs;
          bool ok = true;
          try {
            recs = cavlc_parse_slice(ws, sps, pps, sh, rbsp, nb);
          } catch (const PipError&) {
            ok = false;
          }
          ws.pic = snapshot;
          if (ok) {
            cavlc_model_slice(io, ws, sps, pps, sh, recs, stats);
            modeled = true;
          }
        } else {
          // CABAC: 3-pass — parse, write-verify (per-slice fallback),
          // then model emission. State replays run on a snapshot.
          PicState snapshot = ws.pic;
          SliceCtx sc;
          sc.begin_slice(&sps, &pps, &sh, &ws.pic);
          compute_slice_group_map(sps, pps, sh, ws.pic);
          sc.bench = nb;
          bool ok = true;
          CabacSliceParse pr;
          try {
            pr = cabac_parse_slice(rbsp, sc, sh);
          } catch (const PipError&) {
            ok = false;
          }
          if (ok) {
            ws.pic = snapshot;
            SliceCtx sc2;
            sc2.begin_slice(&sps, &pps, &sh, &ws.pic);
            compute_slice_group_map(sps, pps, sh, ws.pic);
            std::vector<u8> synth;
            try {
              synth = cabac_write_slice(pr.recs, sc2, sh, rbsp.data(),
                                        sh.header_bits);
            } catch (const PipError&) {
              ok = false;
            }
            if (getenv("PIP_DEBUG")) {
              size_t n = std::min(synth.size(), rbsp.size());
              size_t d = 0;
              while (d < n && synth[d] == rbsp[d]) ++d;
              if (d < synth.size() || synth.size() > rbsp.size()) {
                fprintf(stderr,
                        "[pip] FAIL mbs=%zu synth=%zu rbsp=%zu diff=%zu "
                        "orig[-3:]=%02x %02x %02x synth[-3:]=%02x %02x %02x\n",
                        pr.recs.size(), synth.size(), rbsp.size(), d,
                        rbsp[synth.size() - 3], rbsp[synth.size() - 2],
                        rbsp[synth.size() - 1], synth[synth.size() - 3],
                        synth[synth.size() - 2], synth[synth.size() - 1]);
              } else {
                fprintf(stderr, "[pip] OK   mbs=%zu synth=%zu last=%02x\n",
                        pr.recs.size(), synth.size(), synth.back());
              }
            }
            // Different conformant encoders flush the final arithmetic
            // codeword bits differently; only the complete-byte prefix is
            // implementation-invariant. Allow the last few synth bytes to
            // disagree and carry the original tail verbatim.
            if (ok) {
              size_t n = std::min(synth.size(), rbsp.size());
              size_t common = 0;
              while (common < n && synth[common] == rbsp[common]) ++common;
              drop = synth.size() - common;
              ok = drop <= 4 && rbsp.size() >= synth.size() - drop;
            }
            if (ok) {
              trailing.assign(rbsp.begin() + (synth.size() - drop), rbsp.end());
              ok = trailing.size() < 4096;
            }
            if (ok) {
              ws.pic = snapshot;
              cabac_model_slice(io, ws, sps, pps, sh, &pr.recs);
              if (getenv("PIP_DEBUG"))
                fprintf(stderr, "[pip:C] slice mbs=%zu synth=%zu drop=%zu trail=%zu\n",
                        pr.recs.size(), synth.size(), drop, trailing.size());
              if (stats) stats->n_mbs += pr.recs.size();
              modeled = true;
            } else {
              ws.pic = snapshot;
            }
          } else {
            ws.pic = snapshot;
          }
        }
        if (modeled) {
          bool tail = drop != 0 || !trailing.empty();
          size_t before = def.size();
          def.push_back(tail ? REC_SLICE_TAIL : REC_SLICE);
          put_varint(def, prefix_len);
          bill_def(BILL_CONTAINER, double(def.size() - before) * 8);
          def.push_back(payload[0]);
          bill_def(BILL_NAL_HDR, 8);
          before = def.size();
          put_varint(def, sh.header_bits);
          bill_def(BILL_CONTAINER, double(def.size() - before) * 8);
          size_t hbytes = (sh.header_bits + 7) / 8;
          def.insert(def.end(), rbsp.begin(), rbsp.begin() + hbytes);
          bill_def(BILL_SLICE_HDR, double(hbytes) * 8);
          if (tail) {
            before = def.size();
            put_varint(def, drop);
            put_varint(def, trailing.size());
            def.insert(def.end(), trailing.begin(), trailing.end());
            bill_def(BILL_TRAILING, double(def.size() - before) * 8);
          }
          if (stats) {
            ++stats->n_slices;
            // bench ledger for this NAL: MB syntax from the parse, plus
            // framing; the remainder (escapes, alignment, stop bits) is
            // TRAILING, keeping the per-NAL total exactly its byte size
            double mb_bits = 0;
            for (int i = 0; i < BILL_NUM; ++i) {
              stats->bench_bits[i] += nal_bench[i];
              mb_bits += nal_bench[i];
            }
            bill_bench(BILL_STARTCODE, double(prefix_len) * 8);
            bill_bench(BILL_NAL_HDR, 8);
            bill_bench(BILL_SLICE_HDR, double(sh.header_bits));
            double total = double(prefix_len + plen) * 8;
            bill_bench(BILL_TRAILING,
                       total - double(prefix_len) * 8 - 8 -
                           double(sh.header_bits) - mb_bits);
          }
        }
      }
    }
    if (!modeled) {
      int raw_tag;
      if (nal_is_vcl(nal_type)) {
        // keep picture-boundary bookkeeping consistent on both sides
        if (!did_bookkeeping) {
          try {
            std::vector<u8> rbsp = ebsp_to_rbsp(payload + 1, plen - 1);
            BitReader hbr(rbsp.data(), rbsp.size());
            SliceHeader sh = parse_slice_header(hbr, nal_ref_idc, nal_type,
                                                ws.sps_map, ws.pps_map);
            const Pps& pps = ws.pps_map.at(sh.pps_id);
            const Sps& sps = ws.sps_map.at(pps.sps_id);
            ws.on_slice_header(sps, pps, sh);
          } catch (const PipError&) {
            // header unparseable: picture bookkeeping unchanged (mirrored)
          }
        }
        if (stats) ++stats->n_fallback_slices;
        raw_tag = BILL_RAW_FALLBACK;
      } else {
        absorb_nal(ws, payload, plen);
        raw_tag = (nal_type == 7 || nal_type == 8) ? BILL_PARAM_SET
                                                   : BILL_OTHER;
      }
      bill_bench(BILL_STARTCODE, double(prefix_len) * 8);
      bill_bench(raw_tag, double(plen) * 8);
      emit_raw(data + s.prefix_start, s.payload_end - s.prefix_start, raw_tag);
    }
  }
  if (trailing_start < size) {
    emit_raw(data + trailing_start, size - trailing_start, BILL_TRAILING);
    bill_bench(BILL_TRAILING, double(size - trailing_start) * 8);
  }
  def.push_back(REC_END);
  bill_def(BILL_CONTAINER, 8);

  // container
  std::vector<u8> arith = io.w.finish();
  std::vector<u8> out;
  out.push_back('P');
  out.push_back('I');
  out.push_back('P');
  out.push_back('T');
  out.push_back(kPipVersion);
  put_varint(out, size);
  put_varint(out, crc32_ieee(data, size));
  put_varint(out, context_size);
  out.insert(out.end(), context, context + context_size);
  put_varint(out, def.size());
  out.insert(out.end(), def.begin(), def.end());
  put_varint(out, 1);  // number of arith streams
  put_varint(out, 0);  // tag
  put_varint(out, arith.size());
  out.insert(out.end(), arith.begin(), arith.end());

  if (stats) {
    stats->in_bytes = size;
    stats->out_bytes = out.size();
    stats->n_frames = ws.n_frames;
    // merge the ours ledger; the arithmetic coder's final flush bytes and
    // all container framing go to CONTAINER so the total is exactly the
    // output size in bits (reference BillTally invariant,
    // macroblock_model.cpp:124-154)
    double arith_billed = 0;
    for (int i = 0; i < BILL_NUM; ++i) arith_billed += ours_arith[i];
    ours_def[BILL_CONTAINER] += double(arith.size()) * 8 - arith_billed;
    ours_def[BILL_CONTAINER] +=
        double(out.size() - def.size() - arith.size()) * 8;
    for (int i = 0; i < BILL_NUM; ++i)
      stats->bill_bits[i] += ours_arith[i] + ours_def[i];
  }

  if (verify) {
    EngineStats vs;
    std::vector<u8> rt = pip_decompress(out.data(), out.size(), &vs);
    PIP_CHECK(rt.size() == size && memcmp(rt.data(), data, size) == 0,
              "compress-time roundtrip verification failed");
  }
  return out;
}

// ---------------------------------------------------------------------------
// Decompress driver
// ---------------------------------------------------------------------------

// ---------------------------------------------------------------------------
// GOP sharding
// ---------------------------------------------------------------------------
namespace {

struct GopSegments {
  // byte ranges [start,end) of each segment + accumulated SPS/PPS bytes
  // (annex-b framed) active at the start of each segment
  std::vector<std::pair<size_t, size_t>> ranges;
  std::vector<std::vector<u8>> contexts;
};

GopSegments find_gop_segments(const u8* data, size_t size) {
  GopSegments out;
  size_t trailing = size;
  size_t leading = 0;
  std::vector<NalSpan> nals = scan_annexb(data, size, &trailing, &leading);
  if (nals.empty()) {
    out.ranges.push_back({0, size});
    out.contexts.push_back({});
    return out;
  }
  std::vector<size_t> cuts;       // index into nals of segment starts
  std::vector<std::vector<u8>> ctxs;
  std::vector<u8> param_accum;    // all SPS/PPS NAL bytes so far
  int prev_idr_id = -1;
  size_t run_start = 0;  // first NAL of the current non-VCL run
  bool in_nonvcl_run = true;
  cuts.push_back(0);
  ctxs.push_back({});
  for (size_t i = 0; i < nals.size(); ++i) {
    const u8* p = data + nals[i].payload_start;
    size_t plen = nals[i].payload_end - nals[i].payload_start;
    if (plen == 0) continue;
    int type = p[0] & 0x1f;
    bool vcl = type >= 1 && type <= 5;
    if (!vcl) {
      if (!in_nonvcl_run) {
        run_start = i;
        in_nonvcl_run = true;
      }
      if (type == 7 || type == 8) {
        param_accum.insert(param_accum.end(),
                           data + nals[i].prefix_start,
                           data + nals[i].payload_end);
      }
      continue;
    }
    int idr_id = -1;
    if (type == 5) {
      // peek idr_pic_id (first_mb ue, slice_type ue, pps ue, frame_num,
      // idr_pic_id) -- cheap approximate: treat any transition into IDR
      // as a new GOP; consecutive IDR slices of the same AU share
      // idr_pic_id which we distinguish by first_mb_in_slice == 0
      BitReader br(p + 1, std::min<size_t>(plen - 1, 8));
      idr_id = int(br.ue() == 0);  // 1 iff first slice of the IDR picture
    }
    if (type == 5 && idr_id == 1) {
      size_t cut_nal = in_nonvcl_run ? run_start : i;
      if (nals[cut_nal].prefix_start != 0) {
        cuts.push_back(cut_nal);
        ctxs.push_back(param_accum);
      }
    }
    (void)prev_idr_id;
    in_nonvcl_run = false;
  }
  for (size_t k = 0; k < cuts.size(); ++k) {
    // first segment owns any pre-start-code junk bytes
    size_t start = (k == 0) ? 0 : nals[cuts[k]].prefix_start;
    size_t end = (k + 1 < cuts.size()) ? nals[cuts[k + 1]].prefix_start : size;
    out.ranges.push_back({start, end});
    out.contexts.push_back(std::move(ctxs[k]));
  }
  return out;
}

}  // namespace

std::vector<size_t> pip_gop_starts(const u8* data, size_t size) {
  GopSegments segs = find_gop_segments(data, size);
  std::vector<size_t> out;
  for (auto& r : segs.ranges) out.push_back(r.first);
  return out;
}

ShardPlan pip_shard_plan(const u8* data, size_t size, int n_shards) {
  GopSegments segs = find_gop_segments(data, size);
  size_t n_gops = segs.ranges.size();
  ShardPlan plan;
  if (n_shards <= 1 || n_gops <= 1) {
    plan.ranges.push_back({0, size});
    plan.contexts.push_back({});
    return plan;
  }
  // group whole GOPs into <= n_shards byte-balanced shards
  size_t total = size;
  size_t target = (total + n_shards - 1) / n_shards;
  size_t g = 0;
  while (g < n_gops) {
    size_t start_g = g;
    size_t bytes = 0;
    while (g < n_gops && (bytes == 0 || bytes + (segs.ranges[g].second -
                                                 segs.ranges[g].first) <= target)) {
      bytes += segs.ranges[g].second - segs.ranges[g].first;
      ++g;
    }
    plan.ranges.push_back({segs.ranges[start_g].first,
                           segs.ranges[g - 1].second});
    plan.contexts.push_back(segs.contexts[start_g]);
  }
  return plan;
}

std::vector<u8> pip_compress_sharded(const u8* data, size_t size,
                                     int n_shards, bool verify,
                                     EngineStats* stats) {
  ShardPlan plan = pip_shard_plan(data, size, n_shards);
  if (plan.ranges.size() <= 1) {
    return pip_compress(data, size, verify, stats);
  }
  const auto& shard_ranges = plan.ranges;
  const auto& shard_ctx = plan.contexts;
  size_t S = shard_ranges.size();
  std::vector<std::vector<u8>> payloads(S);
  std::vector<EngineStats> sstats(S);
  std::vector<std::string> errors(S);
  std::vector<std::thread> threads;
  for (size_t si = 0; si < S; ++si) {
    threads.emplace_back([&, si] {
      try {
        payloads[si] = pip_compress(
            data + shard_ranges[si].first,
            shard_ranges[si].second - shard_ranges[si].first, verify,
            &sstats[si], shard_ctx[si].data(), shard_ctx[si].size());
      } catch (const std::exception& e) {
        errors[si] = e.what();
      }
    });
  }
  for (auto& t : threads) t.join();
  for (auto& e : errors) PIP_CHECK(e.empty(), "shard compress: " + e);

  std::vector<u8> out;
  out.push_back('P');
  out.push_back('I');
  out.push_back('P');
  out.push_back('S');
  out.push_back(kPipVersion);
  put_varint(out, size);
  put_varint(out, crc32_ieee(data, size));
  put_varint(out, S);
  for (auto& p : payloads) put_varint(out, p.size());
  for (auto& p : payloads) out.insert(out.end(), p.begin(), p.end());
  if (stats) {
    stats->in_bytes = size;
    stats->out_bytes = out.size();
    // PIPS outer framing, so the ours ledger stays exact to out.size()
    size_t inner = 0;
    for (auto& p : payloads) inner += p.size();
    stats->bill_bits[BILL_CONTAINER] += double(out.size() - inner) * 8;
    for (auto& ss : sstats) {
      stats->n_nals += ss.n_nals;
      stats->n_slices += ss.n_slices;
      stats->n_fallback_slices += ss.n_fallback_slices;
      stats->n_frames += ss.n_frames;
      stats->n_mbs += ss.n_mbs;
      for (int i = 0; i < BILL_NUM; ++i) {
        stats->bill_bits[i] += ss.bill_bits[i];
        stats->bench_bits[i] += ss.bench_bits[i];
        stats->prior_total[i] += ss.prior_total[i];
        stats->prior_hits[i] += ss.prior_hits[i];
      }
    }
  }
  return out;
}

static std::vector<u8> decompress_sharded(const u8* data, size_t size,
                                          EngineStats* stats) {
  PIP_CHECK(data[4] == kPipVersion,
            "pip version/model-revision mismatch (file " +
                std::to_string(int(data[4])) + ", this build " +
                std::to_string(int(kPipVersion)) +
                "): recompress the original .264 with this build");
  size_t pos = 5;
  u64 orig_size = get_varint(data, size, &pos);
  u64 orig_crc = get_varint(data, size, &pos);
  u64 S = get_varint(data, size, &pos);
  PIP_CHECK(S >= 1 && S <= 4096, "bad shard count");
  std::vector<size_t> lens(S);
  for (u64 i = 0; i < S; ++i) lens[i] = size_t(get_varint(data, size, &pos));
  // validate every shard extent BEFORE spawning threads: a throw while
  // std::thread objects are joinable is std::terminate, not an exception
  std::vector<size_t> offs(S);
  size_t off = pos;
  for (u64 i = 0; i < S; ++i) {
    offs[i] = off;
    PIP_CHECK(lens[i] <= size - off, "sharded container truncated");
    off += lens[i];
  }
  std::vector<std::vector<u8>> outs(S);
  std::vector<std::string> errors(S);
  std::vector<std::thread> threads;
  for (u64 i = 0; i < S; ++i) {
    size_t o = offs[i];
    threads.emplace_back([&, i, o] {
      try {
        EngineStats ss;
        outs[i] = pip_decompress(data + o, lens[i], &ss);
      } catch (const std::exception& e) {
        errors[i] = e.what();
      }
    });
  }
  for (auto& t : threads) t.join();
  for (auto& e : errors) PIP_CHECK(e.empty(), "shard decompress: " + e);
  std::vector<u8> out;
  out.reserve(size_t(orig_size));
  for (auto& o : outs) out.insert(out.end(), o.begin(), o.end());
  PIP_CHECK(out.size() == orig_size, "sharded size mismatch");
  PIP_CHECK(crc32_ieee(out.data(), out.size()) == u32(orig_crc),
            "sharded CRC mismatch");
  if (stats) {
    stats->in_bytes = size;
    stats->out_bytes = out.size();
  }
  return out;
}

std::vector<u8> pip_decompress(const u8* data, size_t size,
                               EngineStats* stats) {
  size_t pos = 0;
  PIP_CHECK(size >= 5 && data[0] == 'P' && data[1] == 'I' && data[2] == 'P',
            "bad magic");
  if (data[3] == 'S') return decompress_sharded(data, size, stats);
  PIP_CHECK(data[3] == 'T', "bad magic");
  PIP_CHECK(data[4] == kPipVersion,
            "pip version/model-revision mismatch (file " +
                std::to_string(int(data[4])) + ", this build " +
                std::to_string(int(kPipVersion)) +
                "): recompress the original .264 with this build");
  pos = 5;
  u64 orig_size = get_varint(data, size, &pos);
  u64 orig_crc = get_varint(data, size, &pos);
  u64 ctx_len = get_varint(data, size, &pos);
  const u8* ctx = data + pos;
  pos += size_t(ctx_len);
  u64 def_len = get_varint(data, size, &pos);
  const u8* def = data + pos;
  size_t def_size = size_t(def_len);
  pos += def_size;
  u64 n_streams = get_varint(data, size, &pos);
  PIP_CHECK(n_streams == 1, "bad stream count");
  get_varint(data, size, &pos);  // tag
  u64 alen = get_varint(data, size, &pos);
  const u8* arith = data + pos;
  PIP_CHECK(pos + alen <= size, "container truncated");

  StreamReader io;
  io.r.init(arith, size_t(alen));
  WalkState ws;
  if (ctx_len) {
    size_t cts = size_t(ctx_len);
    for (const NalSpan& s : scan_annexb(ctx, size_t(ctx_len), &cts)) {
      absorb_nal(ws, ctx + s.payload_start, s.payload_end - s.payload_start);
    }
  }
  std::vector<u8> out;
  out.reserve(size_t(orig_size));

  size_t dp = 0;
  while (true) {
    PIP_CHECK(dp < def_size, "default stream truncated");
    u8 rec = def[dp++];
    if (rec == REC_END) break;
    if (rec == REC_RAW) {
      u64 len = get_varint(def, def_size, &dp);
      PIP_CHECK(dp + len <= def_size, "raw record truncated");
      const u8* p = def + dp;
      out.insert(out.end(), p, p + len);
      dp += size_t(len);
      // mirror compress-side bookkeeping: find the NAL inside
      size_t q = 0;
      while (q + 2 < len && !(p[q] == 0 && p[q + 1] == 0 && p[q + 2] == 1)) ++q;
      if (q + 2 < len) {
        const u8* payload = p + q + 3;
        size_t plen = len - q - 3;
        if (plen >= 1) {
          int nal_type = payload[0] & 0x1f;
          int nal_ref_idc = (payload[0] >> 5) & 3;
          if (nal_is_vcl(nal_type)) {
            try {
              std::vector<u8> rbsp = ebsp_to_rbsp(payload + 1, plen - 1);
              BitReader hbr(rbsp.data(), rbsp.size());
              SliceHeader sh = parse_slice_header(hbr, nal_ref_idc, nal_type,
                                                  ws.sps_map, ws.pps_map);
              const Pps& pps = ws.pps_map.at(sh.pps_id);
              const Sps& sps = ws.sps_map.at(pps.sps_id);
              ws.on_slice_header(sps, pps, sh);
            } catch (const PipError&) {
            }
          } else {
            absorb_nal(ws, payload, plen);
          }
        }
      }
      continue;
    }
    PIP_CHECK(rec == REC_SLICE || rec == REC_SLICE_TAIL, "bad record type");
    u64 prefix_len = get_varint(def, def_size, &dp);
    u8 nal_header = def[dp++];
    u64 header_bits = get_varint(def, def_size, &dp);
    size_t hbytes = size_t((header_bits + 7) / 8);
    PIP_CHECK(dp + hbytes <= def_size, "slice record truncated");
    const u8* hdr = def + dp;
    dp += hbytes;
    u64 drop = 0, trailing_len = 0;
    const u8* trailing = def + dp;
    if (rec == REC_SLICE_TAIL) {
      drop = get_varint(def, def_size, &dp);
      trailing_len = get_varint(def, def_size, &dp);
      PIP_CHECK(dp + trailing_len <= def_size, "slice trailing truncated");
      trailing = def + dp;
      dp += size_t(trailing_len);
    }

    int nal_type = nal_header & 0x1f;
    int nal_ref_idc = (nal_header >> 5) & 3;
    BitReader hbr(hdr, hbytes);
    SliceHeader sh =
        parse_slice_header(hbr, nal_ref_idc, nal_type, ws.sps_map, ws.pps_map);
    PIP_CHECK(sh.header_bits == header_bits, "slice header bit count mismatch");
    const Pps& pps = ws.pps_map.at(sh.pps_id);
    const Sps& sps = ws.sps_map.at(pps.sps_id);
    ws.on_slice_header(sps, pps, sh);

    std::vector<u8> rbsp;
    if (!pps.entropy_coding_mode) {
      rbsp = recode_slice_cavlc(io, ws, sps, pps, sh, hdr, size_t(header_bits));
    } else {
      // pass 1: scan model symbols into records; pass 2: CABAC-encode
      std::vector<MbRecord> recs;
      cabac_model_slice(io, ws, sps, pps, sh, &recs);
      SliceCtx sc2;
      sc2.begin_slice(&sps, &pps, &sh, &ws.pic);
      compute_slice_group_map(sps, pps, sh, ws.pic);
      rbsp = cabac_write_slice(recs, sc2, sh, hdr, size_t(header_bits));
      if (getenv("PIP_DEBUG"))
        fprintf(stderr, "[pip:D] slice mbs=%zu synth=%zu drop=%llu trail=%llu\n",
                recs.size(), rbsp.size(), (unsigned long long)drop,
                (unsigned long long)trailing_len);
    }
    PIP_CHECK(drop <= rbsp.size(), "slice drop out of range");
    rbsp.resize(rbsp.size() - size_t(drop));
    rbsp.insert(rbsp.end(), trailing, trailing + trailing_len);
    std::vector<u8> ebsp = rbsp_to_ebsp(rbsp);
    for (u64 i = 0; i + 1 < prefix_len; ++i) out.push_back(0);
    out.push_back(1);
    out.push_back(nal_header);
    out.insert(out.end(), ebsp.begin(), ebsp.end());
    if (stats) ++stats->n_slices;
  }
  PIP_CHECK(out.size() == orig_size,
            "reconstructed size mismatch: got " + std::to_string(out.size()) +
                " want " + std::to_string(orig_size));
  PIP_CHECK(crc32_ieee(out.data(), out.size()) == u32(orig_crc),
            "reconstructed stream CRC mismatch");
  if (stats) {
    stats->in_bytes = size;
    stats->out_bytes = out.size();
    stats->n_frames = ws.n_frames;
  }
  return out;
}

}  // namespace h264pip
