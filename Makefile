# Convenience targets; everything also works without make.

.PHONY: test test-fast native bench smoke tpu-check clean

test:
	python -m pytest tests/ -q

# fast correctness tier (<3 min): excludes the CPU-training e2e,
# multiprocess and interpret-kernel-heavy tests marked `slow`
test-fast:
	python -m pytest tests/ -q -m "not slow"

native:
	python -c "from nbest_asr_tpu.data.native_loader import build_library; \
	           print(build_library(force=True) or 'no toolchain')"

bench:
	python bench.py

tpu-check:
	python tools/tpu_kernel_check.py --record TPUCHECK.json

smoke:
	python tools/quality_smoke.py --epochs 30

clean:
	rm -rf native/build .jax_cache
	find . -name __pycache__ -type d -exec rm -rf {} +
