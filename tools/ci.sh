#!/bin/sh
# Full local check battery. CPU-only parts always run; on-chip validation runs
# when a TPU is attached (skip with S3D_SKIP_TPU=1).
set -e
cd "$(dirname "$0")/.."

echo "== native build =="
make -C native

echo "== test suite (CPU, 8-device virtual mesh) =="
python -m pytest tests/ -q

echo "== driver hooks (dryrun self-provisions the 8-device virtual mesh) =="
python -c "
import __graft_entry__ as g
g.dryrun_multichip(8)"
JAX_PLATFORMS=cpu python -c "
import jax; jax.config.update('jax_platforms', 'cpu')
import __graft_entry__ as g
fn, args = g.entry(); print('entry:', fn(*args).shape)"

if [ "${S3D_SKIP_TPU:-0}" != "1" ]; then
    echo "== on-chip kernel validation =="
    python tools/tpu_validate.py
    echo "== headline bench =="
    python bench.py
fi
echo "CI OK"
