# Dev task runner (the TPU analogue of the reference's justfile).
# Tests run on CPU by default (tests/conftest.py pins the platform).

PY ?= python

.PHONY: test test-all test-fast test-hw bench bench-batch serve lint ci verify-assets

test:            ## fast tier on CPU (~4-5 min; deselects tests/slow_tests.txt)
	$(PY) -m pytest tests/ -q -m "not slow"

test-all:        ## full suite on CPU (~22 min measured on this 1-core host)
	$(PY) -m pytest tests/ -q

test-fast:       ## alias of `test` (kept for muscle memory)
	$(PY) -m pytest tests/ -q -m "not slow"

test-hw:         ## full suite on the real TPU chip (slow compiles)
	JAX_COMPILATION_CACHE_DIR=/tmp/jax_comp_cache POCKETTTS_TEST_PLATFORM=axon \
	$(PY) -m pytest tests/ -q -p no:cacheprovider

bench:           ## headline single-chip number (one JSON line)
	$(PY) bench.py

bench-batch:     ## continuous-batching aggregate (8 slots / 16 reqs / k=16)
	$(PY) scripts/bench_batch.py 8 16 16

serve:           ## local server on :8080
	$(PY) -m go_pocket_tts_tpu serve --server-listen-addr 127.0.0.1:8080

lint:            ## syntax check every module
	$(PY) -m compileall -q go_pocket_tts_tpu tests scripts bench.py __graft_entry__.py

ci: lint test    ## what a CI job should run

verify-assets:   ## run the real-asset validation tiers; prints what's pending
	@echo "== real-asset validation (skip-if-absent tiers) =="
	@test -f models/tts_b6369a24.safetensors \
	  && echo "  [ok] checkpoint models/tts_b6369a24.safetensors" \
	  || echo "  [PENDING] checkpoint models/tts_b6369a24.safetensors (python -m go_pocket_tts_tpu model download)"
	@test -f models/tokenizer.model \
	  && echo "  [ok] tokenizer models/tokenizer.model" \
	  || echo "  [PENDING] tokenizer models/tokenizer.model"
	@test -n "$$POCKETTTS_PARITY_FIXTURE" -a -f "$$POCKETTTS_PARITY_FIXTURE" \
	  && echo "  [ok] upstream parity fixture $$POCKETTTS_PARITY_FIXTURE" \
	  || echo "  [PENDING] upstream parity fixture (scripts/dump_parity.py --upstream on a machine with the Go reference + assets, then POCKETTTS_PARITY_FIXTURE=<file>)"
	$(PY) -m pytest tests/test_real_checkpoint.py tests/test_parity_fixture.py \
	  tests/test_tokenizer.py -q -rs
