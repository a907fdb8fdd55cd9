// Arithmetic-coder self-test: round-trips structured and random bit
// sequences through the bool coder and the integer prior codecs.
// Reference parity: test_arithmetic_coding.cpp (run at every process
// start, h264dec.cpp:417-419).
#include "arith.h"

#include <random>

using namespace h264pip;

extern "C" int pip_selftest_arith(char* err, size_t err_cap) {
  auto fail = [&](const char* m) {
    if (err && err_cap) {
      snprintf(err, err_cap, "%s", m);
    }
    return 1;
  };
  std::mt19937 rng(12345);

  // 1) raw bits through the bool coder at many probabilities
  {
    std::vector<std::pair<bool, u8>> seq;
    for (int i = 0; i < 100000; ++i) {
      u8 prob = u8(1 + rng() % 255);
      bool bit = (rng() % 256) >= prob;
      seq.push_back({bit, prob});
    }
    BoolWriter w;
    for (auto& s : seq) w.put(s.first, s.second);
    std::vector<u8> buf = w.finish();
    BoolReader r;
    r.init(buf.data(), buf.size());
    for (auto& s : seq) {
      if (r.get(s.second) != s.first) return fail("bool coder mismatch");
    }
  }

  // 2) adaptive bits
  {
    std::vector<bool> seq;
    for (int i = 0; i < 50000; ++i) seq.push_back((rng() % 10) == 0);
    DynProb pw, pr;
    BoolWriter w;
    for (bool b : seq) w.put_adaptive(b, &pw);
    std::vector<u8> buf = w.finish();
    BoolReader r;
    r.init(buf.data(), buf.size());
    for (bool b : seq) {
      if (r.get_adaptive(&pr) != b) return fail("adaptive bit mismatch");
    }
    // heavily-biased stream should compress well below 1 bit/bit
    if (buf.size() * 8 > 40000) return fail("adaptive coder not compressing");
  }

  // 3) integer codecs (ramps + random + extremes)
  {
    std::vector<i32> vals;
    for (int i = -300; i < 300; ++i) vals.push_back(i);
    for (int i = 0; i < 20000; ++i) vals.push_back(i32(rng() % 65536) - 32768);
    vals.push_back(0);
    vals.push_back(32767);
    vals.push_back(-32768);
    IntPriorT<8, 8, 2> wprior, rprior;
    StreamWriter sw;
    for (i32 v : vals) code_int(sw, v, &wprior, true, true);
    std::vector<u8> buf = sw.w.finish();
    StreamReader sr;
    sr.r.init(buf.data(), buf.size());
    for (i32 v : vals) {
      i32 got = code_int(sr, 0, &rprior, true, true);
      if (got != v) return fail("code_int mismatch");
    }
  }
  {
    std::vector<i32> vals;
    for (int i = -40; i <= 40; ++i) vals.push_back(i);
    for (int i = 0; i < 20000; ++i) vals.push_back(i32(rng() % 4096) - 2048);
    UEGkPriorT<9, 4, 6, 8, 3> wprior, rprior;
    StreamWriter sw;
    for (i32 v : vals) code_uegk(sw, v, &wprior, true);
    std::vector<u8> buf = sw.w.finish();
    StreamReader sr;
    sr.r.init(buf.data(), buf.size());
    for (i32 v : vals) {
      i32 got = code_uegk(sr, 0, &rprior, true);
      if (got != v) return fail("code_uegk mismatch");
    }
  }
  // 4) branch + unary + zero_pow2 style
  {
    BranchPrior<4> wb, rb;
    UnaryPrior<6> wu, ru;
    StreamWriter sw;
    std::vector<u32> bvals, uvals;
    for (int i = 0; i < 5000; ++i) {
      bvals.push_back(rng() % 16);
      uvals.push_back(rng() % 20);
    }
    for (u32 v : bvals) code_branch<StreamWriter, 4>(sw, v, &wb);
    for (u32 v : uvals) code_unary(sw, int(v), &wu);
    for (u32 v : uvals) code_unary(sw, int(std::min(v, 7u)), &wu, 7);
    std::vector<u8> buf = sw.w.finish();
    StreamReader sr;
    sr.r.init(buf.data(), buf.size());
    for (u32 v : bvals) {
      if (code_branch<StreamReader, 4>(sr, 0, &rb) != v)
        return fail("branch mismatch");
    }
    for (u32 v : uvals) {
      if (u32(code_unary(sr, 0, &ru)) != v) return fail("unary mismatch");
    }
    for (u32 v : uvals) {
      if (u32(code_unary(sr, 0, &ru, 7)) != std::min(v, 7u))
        return fail("capped unary mismatch");
    }
  }
  return 0;
}
