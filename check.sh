#!/usr/bin/env bash
# Quality gate — the TPU-repo equivalent of the reference's check.sh
# (fmt/clippy/test/build, reference check.sh:5-11).
set -euo pipefail
cd "$(dirname "$0")"

echo "== import check"
python -c "import wgpu_3dgs_viewer_app_tpu as m; print('version', m.__version__)"

echo "== native codec build"
python -m wgpu_3dgs_viewer_app_tpu.native.build || echo "(native build skipped)"

echo "== tests (CPU, 8-device virtual mesh)"
python -m pytest tests/ -q

echo "== graft entry compile check"
python - <<'PY'
import sys; sys.path.insert(0, '.')
# The config API, not os.environ: TPU boxes preimport jax in sitecustomize
# with the ambient JAX_PLATFORMS=axon, so env mutation here is too late.
# The quality gate must stay CPU-only (and not hang when the tunnel is down).
import jax
jax.config.update('jax_platforms', 'cpu')
import __graft_entry__ as ge
fn, args = ge.entry()
out = jax.jit(fn)(*args)
print('entry ok', out.shape)
ge.dryrun_multichip(min(8, len(jax.devices())))
PY
echo "ALL CHECKS PASSED"
