"""Pluggable force solvers + factory registry.

TPU-native rebuild of the reference's force-computer plugin family
(ForceComputerFactory, include/forces/force_computer_factory.hpp:20-141,
src/forces/force_computer_factory.cpp:14-147). The reference registered only
TreeForceComputer and left Direct/PM/TensorRT as TODO enum values
(force_computer_factory.cpp:129-139); here every name is a real solver:

  name                 solver
  ------------------   -----------------------------------------------------
  direct_reference     jnp broadcast O(N^2) (oracle; small N)
  direct               row-blocked O(N^2); Pallas tiled kernel on TPU
  pm                   particle-mesh Poisson solver (CIC + FFT)
  treepm               PM long-range + short-range pairwise correction
                       (the Barnes-Hut/tree capability, delivered the TPU way)

A "force computer" here is a pure function `accel_fn(state) -> [N,3]`
accelerations, closed over static parameters -- the functional analogue of
IForceComputer::compute_forces (include/core/interfaces.hpp:37-47).
"""

from __future__ import annotations

from typing import Callable

from ..core.config import SimulationConfig
from ..core.state import SimState
from . import direct as _direct

_REGISTRY: dict[str, Callable] = {}


def register_force_computer(name: str):
    """Decorator: register a builder `(config) -> accel_fn` under `name`
    (the register_computer_factory capability,
    force_computer_factory.hpp:58-66)."""
    def deco(builder):
        _REGISTRY[name] = builder
        return builder
    return deco


def available_force_computers() -> list[str]:
    """cf. ForceComputerFactory::get_available_computers."""
    return sorted(_REGISTRY)


def load_plugin(module_path: str) -> list[str]:
    """Dynamic solver-plugin loading (the capability ComponentRegistry::
    load_plugin stubbed as TODO, component_registry.cpp:224-234): import a
    module whose import-time side effects call `register_force_computer`.
    Returns the names newly registered. Python modules replace dlopen."""
    import importlib
    before = set(_REGISTRY)
    importlib.import_module(module_path)
    return sorted(set(_REGISTRY) - before)


def load_plugins_from_env(var: str = "LCDM_FORCE_PLUGINS") -> list[str]:
    """Load a colon-separated list of plugin modules from the environment
    (the env-driven plugin discovery the reference's config promised)."""
    import os
    new: list[str] = []
    for mod in filter(None, os.environ.get(var, "").split(":")):
        new += load_plugin(mod)
    return new


def create_force_computer(config: SimulationConfig) -> Callable[[SimState], object]:
    """Factory entry point (ForceComputerFactory::create_computer,
    force_computer_factory.cpp:14-34), with the configured fallback chain
    (basic_lambda_cdm.json fallback_computers)."""
    name = config.forces.type
    if name not in _REGISTRY:
        fallback = config.forces.fallback
        if fallback in _REGISTRY:
            import logging
            logging.getLogger("lambda_cdm_tpu").warning(
                "force computer %r not registered; falling back to %r",
                name, fallback)
            name = fallback
        else:
            raise KeyError(
                f"unknown force computer {config.forces.type!r}; "
                f"available: {available_force_computers()}")
    return _REGISTRY[name](config)


def auto_pm_grid(config: SimulationConfig) -> int:
    """PM mesh size: configured value or ~2 cells per particle dimension
    (power-of-two >= cbrt(2N); cf. get_recommended_parameters PM heuristic,
    force_computer_factory.cpp:97-104)."""
    if config.forces.pm_grid_size > 0:
        return int(config.forces.pm_grid_size)
    n = config.particles.num_particles
    ng = 16
    while ng ** 3 < 8 * n and ng < 1024:   # ng ~ 2 * N^(1/3)
        ng *= 2
    return ng


def select_optimal_method(num_particles: int, has_tpu: bool = True) -> str:
    """Heuristic solver choice by N (mirrors select_optimal_method,
    force_computer_factory.cpp:115-127, retuned for TPU)."""
    if num_particles < 32_768:
        return "direct"
    if num_particles < 262_144:
        return "treepm"
    return "treepm"


def get_recommended_parameters(num_particles: int) -> dict:
    """cf. get_recommended_parameters, force_computer_factory.cpp:81-113."""
    pm_grid = 1
    while pm_grid ** 3 < max(num_particles // 8, 64):
        pm_grid *= 2
    return {
        "softening_length": 0.01,
        "pm_grid_size": pm_grid,
        "cutoff_cells": 3,
        "chunk_size": 4096 if num_particles > 4096 else num_particles,
    }


# ---------------------------------------------------------------------------
# Built-in solvers
# ---------------------------------------------------------------------------

def _common(config: SimulationConfig):
    f = config.forces
    mg = (f.modified_gravity_strength
          if f.force_kernel == "modified_gravity" else 0.0)
    return (config.particles.box_size, f.softening_length,
            config.units.G, mg)


def _einsum_precision(config: SimulationConfig):
    """forces.precision == "bfloat16": run the force-accumulation
    contraction with bf16 MXU operands / f32 accumulation (the
    reference TRT engine's FP16 build-flag analogue,
    nbody_engine.cpp:45-206 -- an explicit reduced-precision opt-in;
    ~0.4% force error, vs ~1e-7 at the float32 default, which maps to
    Precision.HIGHEST). Displacements and 1/r^3 stay f32 either way."""
    import jax
    return (jax.lax.Precision.DEFAULT
            if config.forces.precision == "bfloat16"
            else jax.lax.Precision.HIGHEST)


@register_force_computer("direct_reference")
def _build_direct_reference(config: SimulationConfig):
    box, soft, g, mg = _common(config)
    prec = _einsum_precision(config)

    def accel_fn(state: SimState):
        return _direct.direct_accelerations(
            state.positions, state.masses, box, soft, g, mg,
            precision=prec)
    return accel_fn


@register_force_computer("direct")
def _build_direct(config: SimulationConfig):
    box, soft, g, mg = _common(config)
    n = config.particles.num_particles
    chunk = min(4096, max(256, n))
    prec = _einsum_precision(config)

    def accel_fn(state: SimState):
        import jax
        if state.positions.shape[0] <= 2048:
            return _direct.direct_accelerations(
                state.positions, state.masses, box, soft, g, mg,
                precision=prec)
        # Pallas tiled kernel on TPU; chunked jnp elsewhere
        if any(d.platform == "tpu" for d in jax.devices()):
            try:
                from ..ops.pallas_direct import pallas_direct_accelerations
                return (1.0 + mg) * pallas_direct_accelerations(
                    state.positions, state.masses, box, soft, g)
            except ImportError:
                pass
        return _direct.direct_accelerations_chunked(
            state.positions, state.masses, box, soft, g, mg,
            chunk_size=chunk, precision=prec)
    return accel_fn


@register_force_computer("pm")
def _build_pm(config: SimulationConfig):
    box, soft, g, mg = _common(config)
    ng = auto_pm_grid(config)

    def accel_fn(state: SimState):
        from .pm import pm_accelerations
        return (1.0 + mg) * pm_accelerations(
            state.positions, state.masses, ng, box, g)
    return accel_fn


@register_force_computer("treepm")
def _build_treepm(config: SimulationConfig):
    box, soft, g, mg = _common(config)
    f = config.forces
    ng = auto_pm_grid(config)

    def accel_fn(state: SimState):
        from .treepm import treepm_accelerations
        return (1.0 + mg) * treepm_accelerations(
            state.positions, state.masses, box, pm_grid=ng,
            softening=soft, g_const=g,
            split_factor=f.split_factor, cut_factor=f.cut_factor,
            capacity=f.bucket_capacity)
    return accel_fn
