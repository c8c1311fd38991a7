#!/usr/bin/env bash
# Dev environment activation (parity with the reference's activate_dev.sh:
# venv activation + experiment-tracking env vars; TPU-specific knobs added).
# Usage: source activate_dev.sh

if [ -d ".venv" ]; then
  # shellcheck disable=SC1091
  source .venv/bin/activate
fi

# Experiment tracking (reference: activate_dev.sh:37-39)
export MLFLOW_TRACKING_URI="${MLFLOW_TRACKING_URI:-file://$PWD/mlruns}"
export WANDB_PROJECT="${WANDB_PROJECT:-twotower-tpu}"

# CPU-mesh testing defaults: 8 virtual devices, CPU backend
alias ttt-test='JAX_PLATFORMS=cpu python -m pytest tests/ -q'
alias ttt-dryrun='JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 python -c "import __graft_entry__ as g; g.dryrun_multichip(8)"'

echo "twotower-tpu dev environment ready (ttt-test, ttt-dryrun)"
