#!/bin/sh
# Pre-warm the persistent XLA compile cache (/tmp/dsf_jax_cache) with
# the production-size 128^2 8-device dryrun graph, so the driver's
# dryrun_multichip(8) call completes in minutes instead of ~30 min of
# cold CPU compile.  Safe to re-run; no-op when cached.
cd "$(dirname "$0")/.." || exit 1
JAX_PLATFORMS=cpu XLA_FLAGS="--xla_force_host_platform_device_count=8" \
  python -c "import __graft_entry__ as g; g.dryrun_multichip(8)"
