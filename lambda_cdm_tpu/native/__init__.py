"""ctypes bindings for the native C++ runtime (lcdm_runtime.cpp).

Compiles the shared library on first use with g++ (no pybind11 needed --
see build.sh for the one-liner). Every feature has a pure-Python fallback,
so the framework works without a compiler; the native path is the
production one (threaded snapshot I/O, host arenas, registry topo-sort).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "lcdm_runtime.cpp")
_LIB_PATH = os.path.join(_HERE, "liblcdm_runtime.so")
_lock = threading.Lock()
_lib = None
_build_error: str | None = None


def _build() -> str | None:
    cmd = ["g++", "-O2", "-std=c++17", "-shared", "-fPIC", "-pthread",
           "-fvisibility=hidden", "-o", _LIB_PATH, _SRC]
    try:
        proc = subprocess.run(cmd, capture_output=True, text=True,
                              timeout=120)
    except (OSError, subprocess.TimeoutExpired) as exc:
        return f"g++ unavailable: {exc}"
    if proc.returncode != 0:
        return f"g++ failed: {proc.stderr[-2000:]}"
    return None


def load_library():
    """Load (building if needed) the native library, or None."""
    global _lib, _build_error
    with _lock:
        if _lib is not None:
            return _lib
        if _build_error is not None:
            return None
        if not os.path.exists(_LIB_PATH) or (
                os.path.getmtime(_LIB_PATH) < os.path.getmtime(_SRC)):
            _build_error = _build()
            if _build_error:
                return None
        lib = ctypes.CDLL(_LIB_PATH)
        _configure(lib)
        _lib = lib
        return _lib


def native_available() -> bool:
    return load_library() is not None


def build_error() -> str | None:
    load_library()
    return _build_error


def _configure(lib) -> None:
    c = ctypes
    lib.lcdm_registry_create.restype = c.c_void_p
    lib.lcdm_registry_destroy.argtypes = [c.c_void_p]
    lib.lcdm_registry_add.argtypes = [c.c_void_p, c.c_char_p]
    lib.lcdm_registry_add.restype = c.c_int
    lib.lcdm_registry_count.argtypes = [c.c_void_p]
    lib.lcdm_registry_count.restype = c.c_int
    lib.lcdm_registry_add_dependency.argtypes = [c.c_void_p, c.c_char_p,
                                                 c.c_char_p]
    lib.lcdm_registry_add_dependency.restype = c.c_int
    lib.lcdm_registry_topo_sort.argtypes = [c.c_void_p,
                                            c.POINTER(c.c_int), c.c_int]
    lib.lcdm_registry_topo_sort.restype = c.c_int
    lib.lcdm_registry_has_cycle.argtypes = [c.c_void_p]
    lib.lcdm_registry_has_cycle.restype = c.c_int
    lib.lcdm_registry_name.argtypes = [c.c_void_p, c.c_int]
    lib.lcdm_registry_name.restype = c.c_char_p

    lib.lcdm_pool_create.argtypes = [c.c_size_t]
    lib.lcdm_pool_create.restype = c.c_void_p
    lib.lcdm_pool_destroy.argtypes = [c.c_void_p]
    lib.lcdm_pool_alloc.argtypes = [c.c_void_p, c.c_size_t, c.c_size_t]
    lib.lcdm_pool_alloc.restype = c.c_void_p
    lib.lcdm_pool_reset.argtypes = [c.c_void_p]
    for fn in ("lcdm_pool_used", "lcdm_pool_capacity", "lcdm_pool_peak",
               "lcdm_pool_alloc_count"):
        getattr(lib, fn).argtypes = [c.c_void_p]
        getattr(lib, fn).restype = c.c_size_t

    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    lib.lcdm_snapshot_write.argtypes = [
        c.c_char_p, c.c_int64, f32p, f32p, f32p, c.c_double, c.c_double,
        c.c_int64]
    lib.lcdm_snapshot_write.restype = c.c_int
    lib.lcdm_snapshot_read_n.argtypes = [c.c_char_p]
    lib.lcdm_snapshot_read_n.restype = c.c_int64
    lib.lcdm_snapshot_read.argtypes = [
        c.c_char_p, c.c_int64, f32p, f32p, f32p,
        c.POINTER(c.c_double), c.POINTER(c.c_double), c.POINTER(c.c_int64)]
    lib.lcdm_snapshot_read.restype = c.c_int

    lib.lcdm_writer_create.restype = c.c_void_p
    lib.lcdm_writer_submit.argtypes = [
        c.c_void_p, c.c_char_p, c.c_int64, f32p, f32p, f32p,
        c.c_double, c.c_double, c.c_int64]
    lib.lcdm_writer_submit.restype = c.c_int
    lib.lcdm_writer_pending.argtypes = [c.c_void_p]
    lib.lcdm_writer_pending.restype = c.c_int
    lib.lcdm_writer_errors.argtypes = [c.c_void_p]
    lib.lcdm_writer_errors.restype = c.c_int
    lib.lcdm_writer_wait.argtypes = [c.c_void_p]
    lib.lcdm_writer_destroy.argtypes = [c.c_void_p]
    lib.lcdm_runtime_version.restype = c.c_char_p


# ---------------------------------------------------------------------------
# High-level wrappers
# ---------------------------------------------------------------------------

class ComponentRegistry:
    """Dependency-resolving registry (native Kahn topo-sort + cycle
    detection; the real version of component_registry.cpp:212-234)."""

    def __init__(self):
        self._lib = load_library()
        if self._lib is None:
            raise RuntimeError(f"native runtime unavailable: "
                               f"{build_error()}")
        self._h = self._lib.lcdm_registry_create()

    def __del__(self):
        if getattr(self, "_h", None):
            self._lib.lcdm_registry_destroy(self._h)
            self._h = None

    def add(self, name: str) -> int:
        return self._lib.lcdm_registry_add(self._h, name.encode())

    def add_dependency(self, name: str, depends_on: str) -> None:
        rc = self._lib.lcdm_registry_add_dependency(
            self._h, name.encode(), depends_on.encode())
        if rc != 0:
            raise KeyError(f"unknown component in ({name}, {depends_on})")

    def initialization_order(self) -> list[str]:
        n = self._lib.lcdm_registry_count(self._h)
        out = (ctypes.c_int * max(n, 1))()
        rc = self._lib.lcdm_registry_topo_sort(self._h, out, n)
        if rc == -1:
            raise ValueError("circular component dependency detected")
        return [self._lib.lcdm_registry_name(self._h, out[i]).decode()
                for i in range(rc)]

    def has_cycle(self) -> bool:
        return bool(self._lib.lcdm_registry_has_cycle(self._h))


class HostArena:
    """Native bump allocator with stats (MemoryPool capability,
    resource_manager.hpp:14-246)."""

    def __init__(self, capacity_bytes: int):
        self._lib = load_library()
        if self._lib is None:
            raise RuntimeError(f"native runtime unavailable: "
                               f"{build_error()}")
        self._h = self._lib.lcdm_pool_create(capacity_bytes)

    def __del__(self):
        if getattr(self, "_h", None):
            self._lib.lcdm_pool_destroy(self._h)
            self._h = None

    def alloc(self, size: int, align: int = 64) -> int:
        ptr = self._lib.lcdm_pool_alloc(self._h, size, align)
        if not ptr:
            raise MemoryError(f"arena exhausted ({self.used}/"
                              f"{self.capacity} bytes)")
        return ptr

    def reset(self) -> None:
        self._lib.lcdm_pool_reset(self._h)

    @property
    def used(self) -> int:
        return self._lib.lcdm_pool_used(self._h)

    @property
    def capacity(self) -> int:
        return self._lib.lcdm_pool_capacity(self._h)

    @property
    def peak(self) -> int:
        return self._lib.lcdm_pool_peak(self._h)

    @property
    def alloc_count(self) -> int:
        return self._lib.lcdm_pool_alloc_count(self._h)


def write_snapshot_native(path: str, positions, velocities, masses,
                          scale_factor: float, time: float,
                          step: int) -> None:
    """Synchronous .lcdm binary snapshot (FNV-1a checksummed)."""
    lib = load_library()
    if lib is None:
        raise RuntimeError(f"native runtime unavailable: {build_error()}")
    pos = np.ascontiguousarray(positions, np.float32)
    vel = np.ascontiguousarray(velocities, np.float32)
    mass = np.ascontiguousarray(masses, np.float32)
    rc = lib.lcdm_snapshot_write(path.encode(), mass.shape[0], pos, vel,
                                 mass, float(scale_factor), float(time),
                                 int(step))
    if rc != 0:
        raise OSError(f"native snapshot write failed (rc={rc}): {path}")


def read_snapshot_native(path: str):
    """-> (positions, velocities, masses, scale_factor, time, step);
    raises on checksum mismatch (corruption detection)."""
    lib = load_library()
    if lib is None:
        raise RuntimeError(f"native runtime unavailable: {build_error()}")
    n = lib.lcdm_snapshot_read_n(path.encode())
    if n < 0:
        raise OSError(f"not a .lcdm snapshot: {path}")
    pos = np.empty((n, 3), np.float32)
    vel = np.empty((n, 3), np.float32)
    mass = np.empty((n,), np.float32)
    a = ctypes.c_double()
    t = ctypes.c_double()
    s = ctypes.c_int64()
    rc = lib.lcdm_snapshot_read(path.encode(), n, pos, vel, mass,
                                ctypes.byref(a), ctypes.byref(t),
                                ctypes.byref(s))
    if rc == -3:
        raise OSError(f"snapshot checksum mismatch (corrupt): {path}")
    if rc != 0:
        raise OSError(f"native snapshot read failed (rc={rc}): {path}")
    return pos, vel, mass, a.value, t.value, s.value


class AsyncSnapshotWriter:
    """Background-thread snapshot writer: simulation continues while
    snapshots hit disk (host-side analogue of the reference's stream
    overlap, lambda_cdm_kernels.cu:411-441)."""

    def __init__(self):
        self._lib = load_library()
        if self._lib is None:
            raise RuntimeError(f"native runtime unavailable: "
                               f"{build_error()}")
        self._h = self._lib.lcdm_writer_create()

    def submit(self, path: str, positions, velocities, masses,
               scale_factor: float, time: float, step: int) -> None:
        pos = np.ascontiguousarray(positions, np.float32)
        vel = np.ascontiguousarray(velocities, np.float32)
        mass = np.ascontiguousarray(masses, np.float32)
        while True:
            rc = self._lib.lcdm_writer_submit(
                self._h, path.encode(), mass.shape[0], pos, vel, mass,
                float(scale_factor), float(time), int(step))
            if rc == 0:
                return
            self.wait()    # bounded queue full: drain

    @property
    def pending(self) -> int:
        return self._lib.lcdm_writer_pending(self._h)

    @property
    def errors(self) -> int:
        return self._lib.lcdm_writer_errors(self._h)

    def wait(self) -> None:
        self._lib.lcdm_writer_wait(self._h)

    def close(self) -> None:
        if getattr(self, "_h", None):
            self.wait()
            self._lib.lcdm_writer_destroy(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:  # noqa: BLE001
            pass
