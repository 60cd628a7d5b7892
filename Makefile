# CI entry points, mirroring the reference's .github/workflows/ci.yml
# (style -> lint, compile+test matrix -> test/dryrun, examples ->
# pipelines tests, bench build -> bench-smoke).

PY ?= python

.PHONY: ci lint test test-full golden dryrun bench-smoke

ci: lint test-full dryrun bench-smoke

lint:
	$(PY) -m compileall -q idsp_tpu benches scripts tests bench.py __graft_entry__.py
	$(PY) scripts/lint.py

# quick lane: skips the `slow`-marked long tail (see tests/conftest.py)
test:
	$(PY) -m pytest tests/ -q -m "not slow"

test-full:
	$(PY) -m pytest tests/ -q

golden:
	rm -f native/libgolden.so
	$(PY) -m pytest tests/test_golden.py -q

dryrun:
	$(PY) -c "import os; os.environ['XLA_FLAGS'] = os.environ.get('XLA_FLAGS', '') + ' --xla_force_host_platform_device_count=8'; import jax; jax.config.update('jax_platforms', 'cpu'); import __graft_entry__ as g; fn, a = g.entry(); fn(*a); g.dryrun_multichip(8); print('dryrun ok')"

bench-smoke:
	IDSP_FORCE_CPU=1 $(PY) benches/suite.py --channels 64 --time 512 --iters 2 --trials 1 --only "df1 (scan)"
	$(PY) benches/scaling.py --devices 1,2 --channels-per-device 16 --time 256 --iters 1
