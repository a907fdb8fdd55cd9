# Test tiers (the reference's CI analog: .travis.yml UnitTest matrix +
# autotest/; SURVEY.md §4.7). The native engine rebuilds itself on
# import (native.py), so no separate build step is needed.
#
#   make check-fast   ~4 min: native-engine roundtrip/billing/arith,
#                     error resilience, RC, processing, decode parity
#                     at a 4-frame cap — the pre-commit gate
#   make check        full suite (full parity caps, JAX compile-heavy
#                     encoder/sharding tests) — the pre-round gate
#   make check-full   full suite with FULL-length stream parity
#                     (PIP_PARITY_FRAMES=0, ~40 min)

PY ?= python

.PHONY: check-fast check check-full native bench

check-fast:
	PIP_PARITY_FRAMES=4 $(PY) -m pytest tests/ -q -m "not slow" -x

check:
	$(PY) -m pytest tests/ -q

check-full:
	PIP_PARITY_FRAMES=0 $(PY) -m pytest tests/ -q

native:
	$(MAKE) -C native

bench:
	$(PY) bench.py
