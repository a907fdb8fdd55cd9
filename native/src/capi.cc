// C API surface for ctypes (the Python side lives in
// losslessh264_tpu/native.py). Mirrors the reference's CLI capabilities
// (h264dec.cpp compress/decompress) as a library.
#include "engine.h"

#include <cstring>

using namespace h264pip;

namespace {
void set_err(char* err, size_t cap, const char* msg) {
  if (err && cap > 0) {
    strncpy(err, msg, cap - 1);
    err[cap - 1] = '\0';
  }
}

u8* alloc_copy(const std::vector<u8>& v) {
  u8* p = static_cast<u8*>(malloc(v.size() ? v.size() : 1));
  if (p && !v.empty()) memcpy(p, v.data(), v.size());
  return p;
}
}  // namespace

extern "C" {

struct PipStats {
  u64 in_bytes, out_bytes, n_nals, n_slices, n_fallback_slices, n_frames, n_mbs;
  double bill[64];    // ours ledger, BILL_NUM entries used
  double bench[64];   // original-H.264 bits ledger, BILL_NUM entries used
  double prior_total[64];
  double prior_hits[64];
};

static void copy_bill(PipStats* o, const EngineStats& st) {
  memset(o->bill, 0, sizeof(o->bill));
  memset(o->bench, 0, sizeof(o->bench));
  memset(o->prior_total, 0, sizeof(o->prior_total));
  memset(o->prior_hits, 0, sizeof(o->prior_hits));
  memcpy(o->bill, st.bill_bits, sizeof(st.bill_bits));
  memcpy(o->bench, st.bench_bits, sizeof(st.bench_bits));
  memcpy(o->prior_total, st.prior_total, sizeof(st.prior_total));
  memcpy(o->prior_hits, st.prior_hits, sizeof(st.prior_hits));
}

int pip_bill_num_c() { return BILL_NUM; }
int pip_version_c() { return int(pip_container_version()); }
const char* pip_bill_name_c(int tag) { return bill_tag_name(tag); }

int pip_compress_c(const u8* data, size_t size, int verify, u8** out,
                   size_t* out_size, PipStats* stats_out, char* err,
                   size_t err_cap) {
  try {
    EngineStats st;
    std::vector<u8> v = pip_compress(data, size, verify != 0, &st);
    *out = alloc_copy(v);
    *out_size = v.size();
    if (stats_out) {
      stats_out->in_bytes = st.in_bytes;
      stats_out->out_bytes = st.out_bytes;
      stats_out->n_nals = st.n_nals;
      stats_out->n_slices = st.n_slices;
      stats_out->n_fallback_slices = st.n_fallback_slices;
      stats_out->n_frames = st.n_frames;
      stats_out->n_mbs = st.n_mbs;
      copy_bill(stats_out, st);
    }
    return 0;
  } catch (const std::exception& e) {
    set_err(err, err_cap, e.what());
    return 1;
  }
}

int pip_compress_sharded_c(const u8* data, size_t size, int n_shards,
                           int verify, u8** out, size_t* out_size,
                           PipStats* stats_out, char* err, size_t err_cap) {
  try {
    EngineStats st;
    std::vector<u8> v =
        pip_compress_sharded(data, size, n_shards, verify != 0, &st);
    *out = alloc_copy(v);
    *out_size = v.size();
    if (stats_out) {
      stats_out->in_bytes = st.in_bytes;
      stats_out->out_bytes = st.out_bytes;
      stats_out->n_nals = st.n_nals;
      stats_out->n_slices = st.n_slices;
      stats_out->n_fallback_slices = st.n_fallback_slices;
      stats_out->n_frames = st.n_frames;
      stats_out->n_mbs = st.n_mbs;
      copy_bill(stats_out, st);
    }
    return 0;
  } catch (const std::exception& e) {
    set_err(err, err_cap, e.what());
    return 1;
  }
}

// Shard decomposition for multi-host compression: writes up to
// max_shards [start,end) byte ranges plus each shard's SPS/PPS context
// bytes (concatenated into ctx_buf, per-shard lengths in ctx_lens).
// Matches pip_compress_sharded's grouping exactly.
int pip_shard_plan_c(const u8* data, size_t size, int n_shards,
                     u64* starts, u64* ends, u64* ctx_lens, u8* ctx_buf,
                     size_t ctx_cap, size_t max_shards, size_t* n_out,
                     char* err, size_t err_cap) {
  try {
    ShardPlan plan = pip_shard_plan(data, size, n_shards);
    size_t S = plan.ranges.size();
    if (S > max_shards) {
      set_err(err, err_cap, "shard plan larger than caller capacity");
      return 1;
    }
    size_t ctx_off = 0;
    for (size_t i = 0; i < S; ++i) {
      starts[i] = plan.ranges[i].first;
      ends[i] = plan.ranges[i].second;
      const auto& c = plan.contexts[i];
      if (ctx_off + c.size() > ctx_cap) {
        set_err(err, err_cap, "shard contexts larger than caller capacity");
        return 1;
      }
      if (!c.empty()) memcpy(ctx_buf + ctx_off, c.data(), c.size());
      ctx_lens[i] = c.size();
      ctx_off += c.size();
    }
    *n_out = S;
    return 0;
  } catch (const std::exception& e) {
    set_err(err, err_cap, e.what());
    return 1;
  }
}

int pip_decompress_c(const u8* data, size_t size, u8** out, size_t* out_size,
                     PipStats* stats_out, char* err, size_t err_cap) {
  try {
    EngineStats st;
    std::vector<u8> v = pip_decompress(data, size, &st);
    *out = alloc_copy(v);
    *out_size = v.size();
    if (stats_out) {
      stats_out->in_bytes = st.in_bytes;
      stats_out->out_bytes = st.out_bytes;
      stats_out->n_slices = st.n_slices;
      stats_out->n_frames = st.n_frames;
    }
    return 0;
  } catch (const std::exception& e) {
    set_err(err, err_cap, e.what());
    return 1;
  }
}

int pip_compress_ctx_c(const u8* data, size_t size, const u8* ctx,
                       size_t ctx_size, int verify, u8** out,
                       size_t* out_size, PipStats* stats_out, char* err,
                       size_t err_cap) {
  try {
    EngineStats st;
    std::vector<u8> v =
        pip_compress(data, size, verify != 0, &st, ctx, ctx_size);
    *out = alloc_copy(v);
    *out_size = v.size();
    if (stats_out) {
      stats_out->in_bytes = st.in_bytes;
      stats_out->out_bytes = st.out_bytes;
      stats_out->n_nals = st.n_nals;
      stats_out->n_slices = st.n_slices;
      stats_out->n_fallback_slices = st.n_fallback_slices;
      stats_out->n_frames = st.n_frames;
      stats_out->n_mbs = st.n_mbs;
      copy_bill(stats_out, st);
    }
    return 0;
  } catch (const std::exception& e) {
    set_err(err, err_cap, e.what());
    return 1;
  }
}

int pip_gop_starts_c(const u8* data, size_t size, u64* out, size_t cap,
                     size_t* n_out, char* err, size_t err_cap) {
  try {
    std::vector<size_t> v = pip_gop_starts(data, size);
    *n_out = v.size();
    for (size_t i = 0; i < v.size() && i < cap; ++i) out[i] = v[i];
    return 0;
  } catch (const std::exception& e) {
    set_err(err, err_cap, e.what());
    return 1;
  }
}

void pip_free(u8* p) { free(p); }

// --- unit-test hooks (bool coder + priors), mirrored from the reference's
// always-on test_arithmetic_coding self-test ---
int pip_selftest_arith(char* err, size_t err_cap);

}  // extern "C"
