"""AOT-compiled force engines with capacity profiles + serialized artifacts.

Capability parity with the reference's TensorRT layer (SURVEY.md section
2.5 mapping): NBodyEngine built TRT networks with min/opt/max optimization
profiles over N, FP16 flags, and engine serialization to `.trt` files
(src/tensorrt/nbody_engine.cpp:45-206). On TPU that role is played by XLA:
this module provides

  * `CompiledForceEngine`: a force solver AOT-compiled at a ladder of
    capacity profiles (inputs padded to the next profile, the exact
    analogue of TRT optimization profiles + setBindingDimensions),
  * optional bf16 pairwise math (the FP16 flag's analogue),
  * `save` / `load` of the serialized executables via `jax.export`
    (the `.trt` engine-file analogue; artifacts are portable across
    processes on the same hardware/runtime version).
"""

from __future__ import annotations

import os
import pickle

import jax
import jax.numpy as jnp

DEFAULT_PROFILES = (16_384, 131_072, 1_048_576)


def _pad_to(n: int, profiles) -> int:
    for p in profiles:
        if n <= p:
            return p
    raise ValueError(f"N={n} exceeds the largest capacity profile "
                     f"{profiles[-1]} (cf. TRT max_batch_size)")


class CompiledForceEngine:
    """Direct pairwise force engine, AOT-compiled per capacity profile.

    Mirrors NBodyEngine's API shape: build once (compile), then
    `compute_forces(positions, masses)` for any N up to the max profile
    -- inputs are zero-mass padded to the profile so no recompiles occur.
    """

    def __init__(self, box_size: float, softening: float = 0.01,
                 g_const: float = 1.0, *, profiles=DEFAULT_PROFILES,
                 use_bf16: bool = False, solver: str = "auto"):
        """solver: "pallas" (the production tiled-DMA direct kernel),
        "reference" (chunked jnp), or "auto" (pallas on TPU)."""
        self.box_size = float(box_size)
        self.softening = float(softening)
        self.g_const = float(g_const)
        self.profiles = tuple(int(p) for p in profiles)
        self.use_bf16 = bool(use_bf16)
        if solver == "auto":
            solver = ("pallas" if any(d.platform == "tpu"
                                      for d in jax.devices())
                      else "reference")
        if solver not in ("pallas", "reference"):
            raise ValueError(f"unknown solver {solver!r}")
        self.solver = solver
        self._exported: dict[int, object] = {}

    # -- the force function (per profile, static shapes) -------------------
    def _force_fn(self):
        box, soft, g = self.box_size, self.softening, self.g_const
        bf16 = self.use_bf16
        solver = self.solver

        def fn(positions, masses):
            if bf16:
                positions = positions.astype(jnp.bfloat16).astype(
                    jnp.float32)
            if solver == "pallas":
                from ..ops.pallas_direct import pallas_direct_accelerations
                return g * pallas_direct_accelerations(
                    positions, masses, box, soft)
            from ..forces.direct import direct_accelerations_chunked
            return direct_accelerations_chunked(
                positions, masses, box, soft, g, chunk_size=2048)

        return fn

    def _export_for(self, profile: int):
        if profile not in self._exported:
            fn = self._force_fn()
            args = (jax.ShapeDtypeStruct((profile, 3), jnp.float32),
                    jax.ShapeDtypeStruct((profile,), jnp.float32))
            self._exported[profile] = jax.export.export(jax.jit(fn))(*args)
        return self._exported[profile]

    def build(self) -> None:
        """Compile every profile up front (TRT buildSerializedNetwork)."""
        for p in self.profiles:
            self._export_for(p)

    def compute_forces(self, positions, masses):
        """[N,3] accelerations for any N <= max profile."""
        n = positions.shape[0]
        profile = _pad_to(n, self.profiles)
        pad = profile - n
        pos = jnp.pad(jnp.asarray(positions, jnp.float32),
                      ((0, pad), (0, 0)))
        mass = jnp.pad(jnp.asarray(masses, jnp.float32), (0, pad))
        out = self._export_for(profile).call(pos, mass)
        return out[:n]

    # -- serialization (the .trt file analogue) ----------------------------
    def save(self, path: str) -> str:
        """Serialize all compiled profiles + engine config."""
        self.build()
        blob = {
            "config": {
                "box_size": self.box_size, "softening": self.softening,
                "g_const": self.g_const, "profiles": self.profiles,
                "use_bf16": self.use_bf16, "solver": self.solver,
            },
            "artifacts": {p: e.serialize()
                          for p, e in self._exported.items()},
        }
        d = os.path.dirname(path)
        if d:
            os.makedirs(d, exist_ok=True)
        with open(path, "wb") as f:
            pickle.dump(blob, f)
        return path

    @classmethod
    def load(cls, path: str) -> "CompiledForceEngine":
        with open(path, "rb") as f:
            blob = pickle.load(f)
        eng = cls(**{k: v for k, v in blob["config"].items()
                     if k != "profiles"},
                  profiles=blob["config"]["profiles"])
        eng._exported = {p: jax.export.deserialize(a)
                         for p, a in blob["artifacts"].items()}
        return eng
