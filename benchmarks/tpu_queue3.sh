#!/bin/bash
# TPU-return validation queue (round 3, session 2). Stages smallest
# first; later stages only run when the cheaper ones pass, so a kernel
# that wedges the chip is caught by the cheapest probe. Logs under
# /tmp/tpu_queue3.
set -u
cd "$(dirname "$0")/.."
LOG=/tmp/tpu_queue3
mkdir -p $LOG

echo "=== stage 0: trivial jit probe"
timeout 180 python -c "
import jax, jax.numpy as jnp, numpy as np
print('alive', np.asarray(jax.jit(lambda a: a*2)(jnp.ones((8,128))))[0,0])
" > $LOG/probe.log 2>&1 || { echo "stage 0 FAILED (tunnel down)"; exit 1; }
echo ok

echo "=== stage 1: PM replica-window gather on-chip (tiny, ppc=6 + ppc=8)"
timeout 1200 python - > $LOG/pm_replica.log 2>&1 <<'EOF'
import sys; sys.path.insert(0, ".")
import jax, jax.numpy as jnp, numpy as np
from lambda_cdm_tpu.ops.pallas_pm_rods import pallas_gather_fd4
from lambda_cdm_tpu.forces.treepm import bucket_particles

for ng, ncell in ((48, 8), (64, 8)):   # ppc=6 (4 replicas), ppc=8 (1)
    box = 30.0
    key = jax.random.PRNGKey(0)
    phi = jax.random.normal(key, (ng, ng, ng))
    n = 4000
    pos = jax.random.uniform(jax.random.PRNGKey(1), (n, 3), maxval=box)
    m = jnp.ones((n,))
    bpos, bmass, _, ovf = bucket_particles(
        pos, m, box, ncell=ncell, capacity=128)
    counts = jnp.sum(bmass > 0, axis=1).astype(jnp.int32)
    live = np.asarray(bmass) > 0   # dead slots: occ path zeros them,
    #                                dense path computes an origin force
    got = np.asarray(pallas_gather_fd4(
        phi, bpos, ncell=ncell, ng=ng, box_size=box))
    # reference: interpret + HIGHEST. Interpret-mode bf16x3 on the TPU
    # backend hits the documented cast-pair folding (CLAUDE.md): XLA
    # folds x - f32(bf16(x)) to zero, degrading it to ONE bf16 pass
    # (~3e-3) -- the real Mosaic kernel is the accurate one (8e-6).
    ref = np.asarray(pallas_gather_fd4(
        phi, bpos, ncell=ncell, ng=ng, box_size=box, interpret=True,
        gemm="highest"))
    scale = np.max(np.abs(ref[live])) + 1e-30
    err = np.max(np.abs((got - ref)[live])) / scale
    print(f"ng={ng} ppc={ng//ncell}: rel err vs interpret {err:.2e}")
    assert err < 1e-4, "replica gather mismatch"
    # occupancy path too
    got_o = np.asarray(pallas_gather_fd4(
        phi, bpos, ncell=ncell, ng=ng, box_size=box, counts=counts))
    err_o = np.max(np.abs((got_o - ref)[live])) / scale
    print(f"      occ path: {err_o:.2e}")
    assert err_o < 1e-4
print("PM REPLICA OK")
EOF
rc=$?; tail -4 $LOG/pm_replica.log; [ $rc -ne 0 ] && echo "stage 1 rc=$rc" && exit 1

echo "=== stage 2: windowed lens sampler on-chip (vs full sampler)"
timeout 1200 python - > $LOG/lens_win.log 2>&1 <<'EOF'
import sys; sys.path.insert(0, ".")
import jax, jax.numpy as jnp, numpy as np
from lambda_cdm_tpu.ops.pallas_lens_sample import (
    pallas_bilinear_sample, pallas_bilinear_sample_xwin, _RT)
F, ng, ext = 3, 256, 100.0
fields = jax.random.normal(jax.random.PRNGKey(0), (F, ng, ng))
n = 4 * _RT + 500
idx = jnp.arange(n) / n
x = (-0.25 + 0.6 * idx) * ext + jax.random.uniform(
    jax.random.PRNGKey(1), (n,), maxval=0.005 * ext)
y = jax.random.uniform(jax.random.PRNGKey(2), (n,), maxval=ext)
xy = jnp.stack([x, y], axis=1)
got = np.asarray(pallas_bilinear_sample_xwin(fields, xy, ext, window=64))
ref = np.asarray(pallas_bilinear_sample(fields, jnp.mod(xy, ext), ext))
err = np.max(np.abs(got - ref))
print(f"windowed vs full sampler: max abs err {err:.2e}")
assert err < 5e-4
print("LENS WIN OK")
EOF
rc=$?; tail -3 $LOG/lens_win.log; [ $rc -ne 0 ] && echo "stage 2 rc=$rc" && exit 1

echo "=== stage 2b: windowed trace_rays vs full (integration parity)"
timeout 1800 python - > $LOG/trace_win.log 2>&1 <<'EOF'
import sys; sys.path.insert(0, ".")
import jax, jax.numpy as jnp, numpy as np
from lambda_cdm_tpu.physics.cosmology import CosmologyParams
from lambda_cdm_tpu.raytracing.lensing import (auto_sample_window,
                                               lens_plane_fields,
                                               trace_rays)
params = CosmologyParams()
ng, L, box = 256, 8, 100.0
planes = 0.2 * jax.random.normal(jax.random.PRNGKey(0), (L, ng, ng))
chis = jnp.linspace(400.0, 1100.0, L)
a_l = jnp.linspace(0.9, 0.7, L)
n_side = 128
ang = (jnp.arange(n_side) + 0.5) * (box / 2000.0) / n_side
theta0 = jnp.stack(jnp.meshgrid(ang, ang, indexing="ij"),
                   -1).reshape(-1, 2)
fl = lens_plane_fields(params, planes, chis, a_l, 100.0, box, 2500.0,
                       ng=ng, jacobian=True)
w = auto_sample_window(fl, chis, theta0, box, ng=ng)
print("window:", w)
assert w > 0
bw = trace_rays(params, planes, chis, a_l, 100.0, box, theta0, 2500.0,
                ng=ng, jacobian=True, window=w, fields_l=fl)
bf = trace_rays(params, planes, chis, a_l, 100.0, box, theta0, 2500.0,
                ng=ng, jacobian=True, window=0, fields_l=fl)
for name in ("theta", "kappa", "gamma", "mu", "omega"):
    a = np.asarray(getattr(bw, name)); b = np.asarray(getattr(bf, name))
    scale = np.max(np.abs(b)) + 1e-30
    err = np.max(np.abs(a - b)) / scale
    print(f"{name}: rel {err:.2e}")
    assert err < 1e-3, name
print("TRACE WIN OK")
EOF
rc=$?; tail -8 $LOG/trace_win.log; [ $rc -ne 0 ] && echo "stage 2b rc=$rc" && exit 1

echo "=== stage 3: 1M full step @192^3 (replica-window PM, vpu4b SR)"
timeout 3000 python benchmarks/exp_fullstep.py > $LOG/fullstep.log 2>&1
rc=$?; tail -4 $LOG/fullstep.log; echo "exp_fullstep rc=$rc"

echo "=== stage 4: lensing section timings (windowed sampler)"
timeout 3000 python - > $LOG/lensing.log 2>&1 <<'EOF'
import sys; sys.path.insert(0, ".")
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import bench
print(bench.section_lensing(0, 100.0))
EOF
rc=$?; tail -5 $LOG/lensing.log; echo "lensing rc=$rc"

echo "=== stage 5: full bench.py (fresh capture + cache warm)"
timeout 5400 python bench.py > $LOG/bench.log 2>&1
rc=$?; tail -3 $LOG/bench.log; echo "bench rc=$rc"
