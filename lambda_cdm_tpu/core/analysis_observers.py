"""Config-driven analysis observers: the missing glue of the reference.

The reference's README markets its analyzers as IObservers added to the
context (README.md:177-185) but no observer adapter exists anywhere in its
tree (SURVEY.md section 3.5). These classes close that gap: each wraps an
on-device analysis and fires at its configured cadence; results are pulled
host-side only at output steps, never inside the jitted hot loop.

`build_observers_from_config` assembles the observer set from the
io.snapshots / io.analysis / io.diagnostics config blocks
(basic_lambda_cdm.json:118-158 schema).
"""

from __future__ import annotations

import os

import jax.numpy as jnp
import numpy as np

from .observers import Observer


class SnapshotObserver(Observer):
    """Writes particle snapshots at io.snapshots.frequency
    (filename pattern capability of basic_lambda_cdm.json:126)."""

    def __init__(self, frequency: int, directory: str = "output",
                 pattern: str = "snapshot_{step:06d}_{redshift:.3f}.npz",
                 fields=None):
        self.frequency = max(1, frequency)
        self.directory = directory
        self.pattern = pattern
        self.fields = fields
        self.written: list[str] = []

    def on_step_end(self, engine, step):
        if step % self.frequency:
            return
        from ..utils import checkpoint as ckpt
        os.makedirs(self.directory, exist_ok=True)
        name = self.pattern.format(step=int(step),
                                   redshift=float(engine.state.redshift))
        path = ckpt.save_snapshot(os.path.join(self.directory, name),
                                  engine.state, engine.config,
                                  fields=self.fields)
        self.written.append(path)


class PowerSpectrumObserver(Observer):
    """Measures P(k) at its cadence (the PowerSpectrumAnalyzer-as-observer
    design, power_spectrum.hpp:26-115 + README.md:177-185)."""

    def __init__(self, frequency: int = 5, grid_size: int = 128,
                 num_bins: int = 64, assignment: str = "cic",
                 k_min=None, k_max=None, directory: str | None = None,
                 subtract_shot_noise: bool = True):
        self.frequency = max(1, frequency)
        self.grid_size = grid_size
        self.num_bins = num_bins
        self.assignment = assignment
        self.k_min, self.k_max = k_min, k_max
        self.directory = directory
        self.subtract_shot_noise = subtract_shot_noise
        self.results: list[dict] = []

    def on_step_end(self, engine, step):
        if step % self.frequency:
            return
        from ..analysis.power_spectrum import (measure_power_spectrum,
                                               save_power_spectrum)
        st = engine.state
        with engine.profiler.timer("analysis.power_spectrum"):
            data = measure_power_spectrum(
                st.positions, engine.config.particles.box_size,
                ng=self.grid_size, num_bins=self.num_bins,
                assignment=self.assignment,
                subtract_shot_noise=self.subtract_shot_noise,
                k_min=self.k_min, k_max=self.k_max)
        rec = {"step": int(step), "scale_factor": float(st.scale_factor),
               "k": np.asarray(data.k), "power": np.asarray(data.power),
               "counts": np.asarray(data.counts),
               "shot_noise": float(data.shot_noise)}
        self.results.append(rec)
        if self.directory:
            os.makedirs(self.directory, exist_ok=True)
            save_power_spectrum(
                os.path.join(self.directory, f"power_{int(step):06d}.txt"),
                data)


class HaloFinderObserver(Observer):
    """FoF + SO halo catalogs at cadence (halo_finder-as-observer)."""

    def __init__(self, frequency: int = 10, linking_length: float = 0.2,
                 min_particles: int = 20, max_halos: int | None = None,
                 overdensity: float = 200.0):
        self.frequency = max(1, frequency)
        self.linking_length = linking_length
        self.min_particles = min_particles
        self.max_halos = max_halos
        self.overdensity = overdensity
        self.catalogs: list[dict] = []

    def on_step_end(self, engine, step):
        if step % self.frequency:
            return
        from ..analysis.halo_finder import find_halos
        st = engine.state
        with engine.profiler.timer("analysis.halo_finder"):
            cat = find_halos(
                st.positions, st.velocities, st.masses,
                engine.config.particles.box_size,
                linking_length_factor=self.linking_length,
                min_particles=self.min_particles,
                max_halos=self.max_halos, overdensity=self.overdensity,
                g_const=engine.config.units.G)
        nh = int(cat.num_halos)
        self.catalogs.append({
            "step": int(step), "num_halos": nh,
            "masses": np.asarray(cat.mass)[:nh],
            "centers": np.asarray(cat.center)[:nh],
            "radii": np.asarray(cat.radius)[:nh],
            "spins": np.asarray(cat.spin)[:nh],
        })


class ConservationObserver(Observer):
    """Energy/momentum/angular-momentum tracking per the io.diagnostics
    block (the capability SimulationEngine::compute_*_energy stubbed,
    simulation_engine.cpp:355-378)."""

    def __init__(self, energy: bool = True, momentum: bool = True,
                 angular_momentum: bool = False, tolerance: float = 0.0):
        self.energy = energy
        self.momentum = momentum
        self.angular_momentum = angular_momentum
        self.tolerance = tolerance
        self.history: list[dict] = []
        self._e0 = None
        self.violations = 0

    def on_step_end(self, engine, step):
        rec = {"step": int(step)}
        if self.energy:
            with engine.profiler.timer("diagnostics.energy"):
                e = engine.compute_energy()
            total = float(e["total"])
            if self._e0 is None:
                self._e0 = total
            err = abs(total - self._e0) / max(abs(self._e0), 1e-30)
            engine.last_energy_error = err
            rec.update(kinetic=float(e["kinetic"]),
                       potential=float(e["potential"]),
                       total=total, energy_error=err)
            if self.tolerance and err > self.tolerance:
                self.violations += 1
        if self.momentum:
            rec["momentum"] = np.asarray(engine.momentum())
        if self.angular_momentum:
            rec["angular_momentum"] = np.asarray(engine.angular_momentum())
        self.history.append(rec)


class ParticleStatisticsObserver(Observer):
    """Per-chunk particle ensemble statistics (the io.diagnostics
    .particle_statistics capability: the reference parses the flag,
    basic_lambda_cdm.json:154, and computes nothing). Records live
    count, rms/max speed and rms displacement from the box center of
    mass -- one fused on-device reduction pass, pulled host-side at
    observer cadence only."""

    def __init__(self):
        self.history: list[dict] = []

    @staticmethod
    def _stats(positions, velocities, masses, box):
        live = masses > 0
        n_live = jnp.sum(live.astype(jnp.int32))
        w = jnp.where(live, masses, 0.0)
        wsum = jnp.maximum(jnp.sum(w), 1e-30)
        v2 = jnp.sum(velocities * velocities, axis=-1)
        v_rms = jnp.sqrt(jnp.sum(w * v2) / wsum)
        v_max = jnp.sqrt(jnp.max(jnp.where(live, v2, 0.0)))
        # periodic-safe mass-weighted spread: phase-average per axis
        theta = positions / box * (2.0 * jnp.pi)
        cx = jnp.sum(w[:, None] * jnp.cos(theta), axis=0) / wsum
        sx = jnp.sum(w[:, None] * jnp.sin(theta), axis=0) / wsum
        # Rbar -> 1 means concentrated, -> 0 uniform (circular stats)
        clustering = jnp.mean(jnp.sqrt(cx * cx + sx * sx))
        return n_live, v_rms, v_max, clustering

    def on_step_end(self, engine, step):
        st = engine.state
        with engine.profiler.timer("diagnostics.particle_statistics"):
            n_live, v_rms, v_max, clustering = self._stats(
                st.positions, st.velocities, st.masses,
                engine.config.particles.box_size)
        self.history.append({
            "step": int(step),
            "scale_factor": float(st.scale_factor),
            "n_live": int(n_live),
            "v_rms": float(v_rms),
            "v_max": float(v_max),
            "clustering_rbar": float(clustering),
        })


class LensingObserver(Observer):
    """Born convergence maps at cadence -- the raytracing capability as a
    first-class observer. With `render_dir` set, each map is ALSO
    rendered to a PNG (the reference README's "built-in raytracing for
    dark matter halo visualization" claim, README.md:32 -- zero code
    there; real here)."""

    def __init__(self, frequency: int = 50, grid_size: int = 128,
                 n_planes: int = 8, z_source: float = 1.0,
                 render_dir: str = ""):
        self.frequency = max(1, frequency)
        self.grid_size = grid_size
        self.n_planes = n_planes
        self.z_source = z_source
        self.render_dir = render_dir
        self.maps: list[dict] = []

    def on_step_end(self, engine, step):
        if step % self.frequency:
            return
        from ..raytracing.lensing import convergence_map_from_state
        with engine.profiler.timer("analysis.lensing"):
            kap = convergence_map_from_state(
                engine.state, engine.config.cosmology_params(),
                engine.config.particles.box_size,
                ng=self.grid_size, n_planes=self.n_planes,
                z_source=self.z_source)
        rec = {"step": int(step), "kappa": np.asarray(kap),
               "kappa_rms": float(jnp.std(kap))}
        if self.render_dir:
            rec["png"] = self._render(np.asarray(kap), int(step),
                                      float(engine.state.redshift))
        self.maps.append(rec)

    def _render(self, kappa, step, redshift) -> str | None:
        try:
            import matplotlib
            matplotlib.use("Agg")
            import matplotlib.pyplot as plt
        except ImportError:
            return None
        import os
        os.makedirs(self.render_dir, exist_ok=True)
        path = os.path.join(self.render_dir,
                            f"kappa_{step:06d}_z{redshift:.2f}.png")
        fig, ax = plt.subplots(figsize=(5, 4), dpi=120)
        vmax = float(np.percentile(np.abs(kappa), 99.5)) or 1e-9
        im = ax.imshow(kappa, origin="lower", cmap="inferno",
                       vmin=-vmax, vmax=vmax)
        ax.set_title(f"Born convergence  step {step}  z={redshift:.2f}")
        ax.set_xlabel("x [pix]")
        ax.set_ylabel("y [pix]")
        fig.colorbar(im, ax=ax, label=r"$\kappa$")
        fig.tight_layout()
        fig.savefig(path)
        plt.close(fig)
        return path


def build_observers_from_config(config) -> list[Observer]:
    """Assemble the observer set the config asks for
    (io.* blocks of basic_lambda_cdm.json)."""
    obs: list[Observer] = []
    io = config.io
    if io.snapshots.enabled:
        obs.append(SnapshotObserver(
            frequency=io.snapshots.frequency,
            directory=config.simulation.output_directory,
            pattern=io.snapshots.filename_pattern,
            fields=io.snapshots.fields))
    if io.analysis.enabled and io.analysis.power_spectrum.enabled:
        ps = io.analysis.power_spectrum
        grid = ps.grid_size or config.particles.initial_conditions.grid_size
        obs.append(PowerSpectrumObserver(
            frequency=ps.frequency, grid_size=max(grid, 32),
            num_bins=ps.num_bins, assignment=ps.assignment,
            k_min=ps.k_min, k_max=ps.k_max,
            directory=config.simulation.output_directory))
    if io.analysis.enabled and io.analysis.halo_finder.enabled:
        hfc = io.analysis.halo_finder
        obs.append(HaloFinderObserver(
            frequency=hfc.frequency,
            linking_length=hfc.linking_length,
            min_particles=hfc.min_particles,
            overdensity=hfc.overdensity))
    d = io.diagnostics
    if d.energy_conservation or d.momentum_conservation \
            or d.angular_momentum_conservation:
        obs.append(ConservationObserver(
            energy=d.energy_conservation,
            momentum=d.momentum_conservation,
            angular_momentum=d.angular_momentum_conservation,
            tolerance=config.validation.tolerance
            if config.validation.check_energy_conservation else 0.0))
    if d.particle_statistics:
        obs.append(ParticleStatisticsObserver())
    return obs
