# Development workflow targets (the reference README declares `make
# setup-dev` etc. at README.md:71-76 without shipping a Makefile).
.PHONY: setup-dev test test-fast lint docs bench bench-check dryrun pipeline parity clean

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

# Oracle parity: planted-teacher quality validation (docs/oracle.md).
#   make oracle-parity                       # config2 (1M rows, ~6 min)
#   make oracle-parity ORACLE_SCALE=config3  # 50M rows, ~1 h
ORACLE_SCALE ?= config2
oracle-parity:
	python benchmarks/oracle_parity.py --scale $(ORACLE_SCALE)

# Validate the multi-chip sharded paths on 8 virtual CPU devices, exactly
# as the driver does.
dryrun:
	JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
	python -c "import __graft_entry__ as g; g.dryrun_multichip(8)"

# Metric-parity packet (NEEDS NETWORK EGRESS): download the reference's
# 5-core categories, prepare, train a BASELINE preset, evaluate exactly, and
# print Recall@10/NDCG@10 next to the reference's published 0.342/0.287
# (reference README.md:80). See benchmarks/parity_packet.py and BASELINE.md.
#   make parity                                               # config 2
#   make parity PARITY_CONFIG=configs/full_category_8chip.yaml \
#               PARITY_FLAGS="--train-flags --mesh"           # config 3
PARITY_CONFIG ?= configs/books_1m.yaml
PARITY_FLAGS ?=
parity:
	python benchmarks/parity_packet.py --config $(PARITY_CONFIG) $(PARITY_FLAGS)

# One-command data pipeline (download -> prepare), dev sample size.
pipeline:
	python -m twotower_tpu.data.orchestrate --config configs/development.yaml \
	--sample-size 1000

clean:
	rm -rf build dist *.egg-info .pytest_cache .ruff_cache htmlcov
	find . -name __pycache__ -type d -exec rm -rf {} + 2>/dev/null || true
