"""Checkpoint / snapshot I/O: bit-exact save & resume.

Real implementation of the reference's stubbed persistence surface:
IDataExporter::export/import_snapshot (include/core/interfaces.hpp:70-82),
SimulationEngine::create_checkpoint/restore_from_checkpoint
(simulation_engine.hpp:123-131, whose bodies always returned false /
printed a line, simulation_engine.cpp:255-258,295-298), and the
snapshot_{step}_{redshift} filename pattern + field list of
basic_lambda_cdm.json:122-132.

Two formats:
  * npz (default): single-file, dependency-free, bit-exact.
  * orbax: directory-based OCDBT checkpointing for sharded multi-chip
    states (each shard written by its host; resume restores the sharding).
"""

from __future__ import annotations

import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from ..core.state import SimState

_STATE_FIELDS = ("positions", "velocities", "masses", "scale_factor",
                 "time", "step", "rng_key")


def state_to_host(state: SimState) -> dict:
    return {f: np.asarray(getattr(state, f)) for f in _STATE_FIELDS}


def state_from_host(arrays: dict) -> SimState:
    return SimState(**{f: jnp.asarray(arrays[f]) for f in _STATE_FIELDS})


def save_snapshot(path: str, state: SimState, config=None,
                  fields=None) -> str:
    """Write a particle snapshot. `fields` filters which arrays are stored
    (io.snapshots.fields capability). A `.lcdm` extension selects the
    native checksummed binary codec (lambda_cdm_tpu.native); default npz."""
    if path.endswith(".lcdm"):
        from ..native import write_snapshot_native
        d = os.path.dirname(path)
        if d:
            os.makedirs(d, exist_ok=True)
        write_snapshot_native(
            path, np.asarray(state.positions), np.asarray(state.velocities),
            np.asarray(state.masses), float(state.scale_factor),
            float(state.time), int(state.step))
        return path
    if path.endswith((".h5", ".hdf5")):
        return _save_snapshot_hdf5(path, state, config, fields)
    if path.endswith((".txt", ".ascii")):
        return _save_snapshot_ascii(path, state)
    if not path.endswith(".npz"):
        path = path + ".npz"
    data = state_to_host(state)
    if fields:
        # particle_ids are implicit (stable array order); always keep the
        # scalars needed to interpret the snapshot
        keep = set(fields) | {"scale_factor", "time", "step", "rng_key"}
        data = {k: v for k, v in data.items() if k in keep}
    meta = {}
    if config is not None:
        meta["config"] = config.to_dict()
    d = os.path.dirname(path)
    if d:
        os.makedirs(d, exist_ok=True)
    np.savez_compressed(path, __meta__=json.dumps(meta), **data)
    return path


def _save_snapshot_hdf5(path: str, state: SimState, config=None,
                        fields=None) -> str:
    """HDF5 snapshot with gzip compression (the reference's promised
    HDF5 exporter, interfaces.hpp:70-82 / io config block,
    basic_lambda_cdm.json:122-132 -- never implemented there)."""
    import h5py
    d = os.path.dirname(path)
    if d:
        os.makedirs(d, exist_ok=True)
    data = state_to_host(state)
    if fields:
        keep = set(fields) | {"scale_factor", "time", "step", "rng_key"}
        data = {k: v for k, v in data.items() if k in keep}
    with h5py.File(path, "w") as f:
        g = f.create_group("particles")
        for k, v in data.items():
            if np.ndim(v) > 0:
                g.create_dataset(k, data=v, compression="gzip",
                                 compression_opts=4)
            else:
                f.attrs[k] = v
        f.attrs["format_version"] = 1
        if config is not None:
            f.attrs["config"] = json.dumps(config.to_dict())
    return path


def _load_snapshot_hdf5(path: str) -> tuple[SimState, dict]:
    import h5py
    arrays = {}
    meta = {}
    with h5py.File(path, "r") as f:
        for k in f["particles"]:
            arrays[k] = np.asarray(f["particles"][k])
        for k in f.attrs:
            if k == "config":
                meta["config"] = json.loads(f.attrs[k])
            elif k != "format_version":
                arrays[k] = np.asarray(f.attrs[k])
    return state_from_host(_fill_missing_fields(arrays)), meta


def _save_snapshot_ascii(path: str, state: SimState) -> str:
    """Whitespace-columns ASCII snapshot (x y z vx vy vz m), one header
    line with scalars -- the reference's claimed ASCII output format."""
    d = os.path.dirname(path)
    if d:
        os.makedirs(d, exist_ok=True)
    pos = np.asarray(state.positions)
    vel = np.asarray(state.velocities)
    mass = np.asarray(state.masses)
    table = np.hstack([pos, vel, mass[:, None]])
    header = (f"lambda_cdm_tpu snapshot  a={float(state.scale_factor)!r} "
              f"time={float(state.time)!r} step={int(state.step)} "
              f"columns=x y z vx vy vz mass")
    np.savetxt(path, table, header=header)
    return path


def load_snapshot(path: str) -> tuple[SimState, dict]:
    if path.endswith((".h5", ".hdf5")):
        return _load_snapshot_hdf5(path)
    if path.endswith(".lcdm"):
        from ..native import read_snapshot_native
        pos, vel, mass, a, t, step = read_snapshot_native(path)
        state = SimState(
            positions=jnp.asarray(pos), velocities=jnp.asarray(vel),
            masses=jnp.asarray(mass), scale_factor=jnp.asarray(a),
            time=jnp.asarray(t), step=jnp.asarray(step, jnp.int32),
            rng_key=jax.random.PRNGKey(0))
        return state, {}
    if not path.endswith(".npz"):
        path = path + ".npz"
    with np.load(path, allow_pickle=False) as z:
        meta = json.loads(str(z["__meta__"])) if "__meta__" in z else {}
        arrays = {f: z[f] for f in _STATE_FIELDS if f in z}
    state = state_from_host(_fill_missing_fields(arrays))
    return state, meta


def _fill_missing_fields(arrays: dict) -> dict:
    """Field-filtered snapshots (io.snapshots.fields) may omit arrays:
    fill with neutral values so the state reconstructs."""
    if "positions" not in arrays:
        raise KeyError("snapshot has no positions array")
    n = arrays["positions"].shape[0]
    defaults = {
        "velocities": lambda: np.zeros((n, 3), np.float32),
        "masses": lambda: np.ones((n,), np.float32),
        "scale_factor": lambda: np.float32(1.0),
        "time": lambda: np.float32(0.0),
        "step": lambda: np.int32(0),
        "rng_key": lambda: np.zeros((2,), np.uint32),
    }
    for f, mk in defaults.items():
        if f not in arrays:
            arrays[f] = mk()
    return arrays


def save_checkpoint(path: str, state: SimState, config=None,
                    statistics: dict | None = None) -> str:
    """Full checkpoint: complete SimState PyTree (positions/velocities/
    masses/a/t/step/RNG key) + config + statistics -> resume is bit-exact."""
    if not path.endswith(".npz"):
        path = path + ".npz"
    meta = {"statistics": statistics or {}}
    if config is not None:
        meta["config"] = config.to_dict()
    d = os.path.dirname(path)
    if d:
        os.makedirs(d, exist_ok=True)
    np.savez_compressed(path, __meta__=json.dumps(meta),
                        **state_to_host(state))
    return path


def load_checkpoint(path: str) -> tuple[SimState, dict, dict]:
    """Returns (state, config_dict, statistics)."""
    if not path.endswith(".npz"):
        path = path + ".npz"
    with np.load(path, allow_pickle=False) as z:
        meta = json.loads(str(z["__meta__"])) if "__meta__" in z else {}
        arrays = {f: z[f] for f in _STATE_FIELDS}
    return (state_from_host(arrays), meta.get("config", {}),
            meta.get("statistics", {}))


# ---------------------------------------------------------------------------
# Orbax path (sharded / multi-host)
# ---------------------------------------------------------------------------

def save_checkpoint_orbax(directory: str, state: SimState,
                          step: int | None = None) -> str:
    """Orbax OCDBT checkpoint -- the multi-chip-safe format: sharded arrays
    are written without gathering to one host."""
    import orbax.checkpoint as ocp
    directory = os.path.abspath(directory)
    ckptr = ocp.StandardCheckpointer()
    step = int(state.step) if step is None else step
    path = os.path.join(directory, f"step_{step:08d}")
    ckptr.save(path, state)
    ckptr.wait_until_finished()
    return path


def load_checkpoint_orbax(path: str, template: SimState | None = None
                          ) -> SimState:
    """Restore an Orbax checkpoint. `path` may be a `step_XXXXXXXX`
    directory or a parent directory holding them (latest step wins).
    Without a template the arrays restore unsharded on the default device
    (fine for single-host resume; pass a sharded template to restore the
    original sharding)."""
    import orbax.checkpoint as ocp
    path = os.path.abspath(path)
    if not os.path.basename(path).startswith("step_"):
        steps = sorted(d for d in os.listdir(path) if d.startswith("step_"))
        if not steps:
            raise FileNotFoundError(f"no step_* checkpoints under {path}")
        path = os.path.join(path, steps[-1])
    ckptr = ocp.StandardCheckpointer()
    if template is not None:
        return ckptr.restore(path, template)
    arrays = ckptr.restore(path)
    return SimState(**{f: jnp.asarray(arrays[f]) for f in _STATE_FIELDS})
