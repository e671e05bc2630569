"""Native C++ runtime tests: registry topo-sort/cycle detection, arena
allocator, binary snapshot codec (+ corruption detection), async writer."""

import numpy as np
import pytest

from lambda_cdm_tpu import native

pytestmark = pytest.mark.skipif(
    not native.native_available(),
    reason=f"native runtime unavailable: {native.build_error()}")


class TestRegistry:
    def test_topological_order(self):
        reg = native.ComponentRegistry()
        for name in ("engine", "forces", "cosmology", "integrator"):
            reg.add(name)
        reg.add_dependency("engine", "forces")
        reg.add_dependency("engine", "integrator")
        reg.add_dependency("forces", "cosmology")
        reg.add_dependency("integrator", "cosmology")
        order = reg.initialization_order()
        assert order.index("cosmology") < order.index("forces")
        assert order.index("forces") < order.index("engine")
        assert order.index("integrator") < order.index("engine")

    def test_cycle_detection(self):
        reg = native.ComponentRegistry()
        reg.add("a")
        reg.add("b")
        reg.add_dependency("a", "b")
        assert not reg.has_cycle()
        reg.add_dependency("b", "a")
        assert reg.has_cycle()
        with pytest.raises(ValueError):
            reg.initialization_order()

    def test_unknown_dependency_raises(self):
        reg = native.ComponentRegistry()
        reg.add("a")
        with pytest.raises(KeyError):
            reg.add_dependency("a", "ghost")

    def test_duplicate_add_is_idempotent(self):
        reg = native.ComponentRegistry()
        assert reg.add("x") == reg.add("x")


class TestArena:
    def test_alloc_and_stats(self):
        arena = native.HostArena(1 << 20)
        p1 = arena.alloc(1000)
        p2 = arena.alloc(1000)
        assert p2 != p1
        assert arena.used >= 2000
        assert arena.peak >= arena.used
        assert arena.alloc_count == 2
        arena.reset()
        assert arena.used == 0
        assert arena.peak >= 2000   # peak survives reset

    def test_alignment(self):
        arena = native.HostArena(1 << 16)
        p = arena.alloc(10, align=256)
        assert p % 256 == 0

    def test_exhaustion(self):
        arena = native.HostArena(1024)
        with pytest.raises(MemoryError):
            arena.alloc(4096)


class TestSnapshotCodec:
    def _data(self, n=1000):
        rng = np.random.RandomState(0)
        return (rng.rand(n, 3).astype(np.float32),
                rng.rand(n, 3).astype(np.float32),
                rng.rand(n).astype(np.float32))

    def test_roundtrip_bit_exact(self, tmp_path):
        pos, vel, mass = self._data()
        path = str(tmp_path / "snap.lcdm")
        native.write_snapshot_native(path, pos, vel, mass, 0.5, 1.25, 42)
        p2, v2, m2, a, t, s = native.read_snapshot_native(path)
        np.testing.assert_array_equal(p2, pos)
        np.testing.assert_array_equal(v2, vel)
        np.testing.assert_array_equal(m2, mass)
        assert (a, t, s) == (0.5, 1.25, 42)

    def test_corruption_detected(self, tmp_path):
        pos, vel, mass = self._data()
        path = str(tmp_path / "corrupt.lcdm")
        native.write_snapshot_native(path, pos, vel, mass, 0.5, 0.0, 1)
        raw = bytearray(open(path, "rb").read())
        raw[200] ^= 0xFF   # flip a payload byte
        open(path, "wb").write(bytes(raw))
        with pytest.raises(OSError, match="checksum"):
            native.read_snapshot_native(path)

    def test_bad_file_rejected(self, tmp_path):
        path = str(tmp_path / "junk.lcdm")
        open(path, "wb").write(b"not a snapshot")
        with pytest.raises(OSError):
            native.read_snapshot_native(path)


class TestAsyncWriter:
    def test_writes_complete(self, tmp_path):
        pos, vel, mass = (np.zeros((100, 3), np.float32),
                          np.zeros((100, 3), np.float32),
                          np.ones(100, np.float32))
        writer = native.AsyncSnapshotWriter()
        paths = [str(tmp_path / f"s{i}.lcdm") for i in range(12)]
        for i, p in enumerate(paths):
            writer.submit(p, pos, vel, mass, 0.1 * i, 0.0, i)
        writer.wait()
        assert writer.errors == 0
        writer.close()
        for i, p in enumerate(paths):
            _, _, m2, a, _, s = native.read_snapshot_native(p)
            assert s == i
            np.testing.assert_array_equal(m2, mass)
