#!/bin/bash
# Round-4g chip session: full-FF fusion A/B (ops/geglu_matmul.py
# ff_matmul — up-proj + GEGLU gate + down-proj in one kernel, the
# [M, 8d] intermediate never leaves VMEM).  Controls: r4f FUSED_GEGLU
# (now default) SDXL 0.2978 / SD1.5 1.4615.
#
#   nohup bash scripts/chip_session_r4g.sh > /tmp/chip_r4g.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
stamp() { echo "=== $1 [$(date -u +%H:%M:%S)] ==="; }

stamp "smoke: ff_matmul compiles + matches on chip at SDXL shapes"
THEATERGEN_FUSED_FF=1 timeout 1200 python - <<'EOF' 2>&1 | tail -6
import jax, jax.numpy as jnp, numpy as np
from theatergen_tpu.ops import geglu_matmul as gg
for (m, d, k) in [(8192, 640, 2560), (2048, 1280, 5120)]:
    ks = jax.random.split(jax.random.key(0), 4)
    x = jax.random.normal(ks[0], (m, d), jnp.bfloat16)
    w1 = jax.random.normal(ks[1], (d, 2 * k), jnp.bfloat16) * 0.05
    b1 = jax.random.normal(ks[2], (2 * k,), jnp.float32) * 0.1
    w2 = jax.random.normal(ks[3], (k, d), jnp.bfloat16) * 0.05
    out = np.asarray(jax.jit(gg.ff_matmul)(x, w1, b1, w2), np.float32)
    ref = np.asarray(jax.jit(gg._ff_reference)(x, w1, b1, w2), np.float32)
    err = np.max(np.abs(out - ref)) / (np.max(np.abs(ref)) + 1e-6)
    print(f"ff_matmul ({m},{d},{k}): rel-max-err {err:.4f}")
    assert err < 0.05, err
print("SMOKE OK")
EOF

stamp "bench sdxl FUSED_FF"
THEATERGEN_FUSED_FF=1 \
  THEATERGEN_BENCH_MODEL=sdxl THEATERGEN_BENCH_BATCH=1 \
  THEATERGEN_BENCH_STEPS=30 \
  timeout 2400 python bench.py 2>&1 | tee /tmp/r4g_sdxl_ff.log | tail -3

stamp "bench sd15 FUSED_FF (headline program)"
THEATERGEN_FUSED_FF=1 \
  THEATERGEN_BENCH_IP=0 THEATERGEN_BENCH_SDXL=0 \
  timeout 2400 python bench.py 2>&1 | tee /tmp/r4g_sd15_ff.log | tail -3

stamp "bench sdxl FUSED_FF + FF_BARRIER (compose the +0.5%)"
THEATERGEN_FUSED_FF=1 THEATERGEN_FF_BARRIER=1 \
  THEATERGEN_BENCH_MODEL=sdxl THEATERGEN_BENCH_BATCH=1 \
  THEATERGEN_BENCH_STEPS=30 \
  timeout 2400 python bench.py 2>&1 | tee /tmp/r4g_sdxl_ff_barrier.log | tail -3

stamp "profile sdxl FUSED_FF (itemization under the kernel)"
THEATERGEN_FUSED_FF=1 THEATERGEN_TRACE_DIR=/tmp/tg_prof_sdxl_ff \
  THEATERGEN_BENCH_MODEL=sdxl THEATERGEN_BENCH_BATCH=1 \
  timeout 2400 python scripts/profile_step.py 2>&1 \
  | tee /tmp/r4g_sdxl_ff_profile.log | tail -12

stamp "done"
