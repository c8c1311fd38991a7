# Development workflow targets (the reference README declares `make
# setup-dev` etc. at README.md:71-76 without shipping a Makefile).
.PHONY: setup-dev test test-fast lint docs bench bench-check dryrun pipeline clean

setup-dev:
	pip install -e . --no-deps --no-build-isolation
	pre-commit install || true
	. ./activate_dev.sh || true

test:
	python -m pytest tests/ -q

test-fast:
	python -m pytest tests/ -q -x -m "not slow"

lint:
	python -m ruff check . || ruff check .
	python -m mypy twotower_tpu || true

docs:
	$(MAKE) -C docs html

bench:
	python bench.py

# Bench with the perf floor enforced: exits 2 if throughput regresses more
# than 10% vs the newest recorded BENCH_r*.json.
bench-check:
	python bench.py --enforce-floor

# Validate the multi-chip sharded paths on 8 virtual CPU devices, exactly
# as the driver does.
dryrun:
	JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
	python -c "import __graft_entry__ as g; g.dryrun_multichip(8)"

# One-command data pipeline (download -> prepare), dev sample size.
pipeline:
	python -m twotower_tpu.data.orchestrate --config configs/development.yaml \
	--sample-size 1000

clean:
	rm -rf build dist *.egg-info .pytest_cache .ruff_cache htmlcov
	find . -name __pycache__ -type d -exec rm -rf {} + 2>/dev/null || true
