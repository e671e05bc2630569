"""Engine warmup + persistent-cache cold-start story (VERDICT round-2
item 5): warmup() AOT-compiles the exact run-loop programs, and with
compute.tpu.compilation_cache_dir configured a fresh process reuses the
on-disk executables instead of recompiling (the capability of the
reference's serialized TensorRT engines, nbody_engine.cpp:120-206)."""

import os
import subprocess
import sys

import jax
import jax.numpy as jnp
import pytest

from lambda_cdm_tpu.core.config import SimulationConfig
from lambda_cdm_tpu.core.engine import SimulationEngine
from lambda_cdm_tpu.core.state import make_state


def _config(n, cache_dir="", solver="treepm_fast", chunk=4):
    cfg = SimulationConfig()
    cfg.particles.num_particles = n
    cfg.particles.box_size = 50.0
    cfg.forces.type = solver
    cfg.forces.softening_length = 0.5
    cfg.forces.rebucket_every = 2
    cfg.time.initial_timestep = 1e-5
    cfg.time.final_time = 1e9
    cfg.cosmology.initial_redshift = 9.0
    cfg.simulation.output_frequency = chunk
    cfg.simulation.checkpoint_frequency = 0
    cfg.profiling.output_file = ""
    cfg.compute.tpu.compilation_cache_dir = cache_dir
    cfg.compute.tpu.persistent_cache_min_compile_secs = 0.0
    return cfg


def _engine(n, **kw):
    key = jax.random.PRNGKey(0)
    pos = jax.random.uniform(key, (n, 3), maxval=50.0)
    eng = SimulationEngine(_config(n, **kw))
    eng.initialize(state=make_state(pos, jnp.zeros_like(pos),
                                    jnp.ones((n,)), scale_factor=0.1))
    return eng


class TestWarmup:
    def test_fast_path_warmup_then_run(self):
        eng = _engine(2048)
        out = eng.warmup()
        # chunk=4 > rebucket_every=2: the segment program + the
        # rebucket pass (no remainder: 4 % 2 == 0)
        assert out["programs"] >= 2 and out["seconds"] > 0
        eng.run(num_steps=4)
        assert int(eng.statistics.total_steps) >= 4

    def test_generic_path_warmup_then_run(self):
        eng = _engine(512, solver="direct")
        out = eng.warmup()
        assert out["programs"] == 1
        eng.run(num_steps=4)
        assert int(eng.statistics.total_steps) >= 4

    def test_warmup_requires_initialize(self):
        eng = SimulationEngine(_config(512))
        with pytest.raises(RuntimeError):
            eng.warmup()


_CHILD = r"""
import sys, time, json
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
sys.path.insert(0, {repo!r})
from tests.test_warmup import _engine
t0 = time.perf_counter()
eng = _engine(8192, cache_dir={cache!r})
out = eng.warmup()
eng.run(num_steps=4)
print(json.dumps({{"warmup_s": out["seconds"],
                   "total_s": time.perf_counter() - t0}}))
"""


@pytest.mark.slow
def test_persistent_cache_fresh_process_warm_start(tmp_path):
    """Two fresh processes at identical shapes: the second one's warmup
    writes NO new cache entries (pure hits) and is faster."""
    import json
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cache = str(tmp_path / "xla_cache")

    def start():
        r = subprocess.run(
            [sys.executable, "-c",
             _CHILD.format(repo=repo, cache=cache)],
            capture_output=True, text=True, timeout=900, cwd=repo)
        assert r.returncode == 0, r.stderr[-2000:]
        return json.loads(r.stdout.strip().splitlines()[-1])

    first = start()
    n_entries = len(os.listdir(cache))
    assert n_entries > 0, "warmup wrote no persistent cache entries"
    second = start()
    assert len(os.listdir(cache)) == n_entries, \
        "second process recompiled (cache misses)"
    assert second["warmup_s"] < first["warmup_s"], (first, second)
