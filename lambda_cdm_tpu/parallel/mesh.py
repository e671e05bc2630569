"""Device-mesh construction and sharding helpers.

TPU-native replacement for the reference's MPI topology layer
(ClusterCommunicator's MPI_Dims_create 3D grid + rank bookkeeping,
src/mpi/cluster_comm.cpp:25-88, and DomainDecomposer's MPI_Cart_create,
src/mpi/domain_decomposition.cpp:10-112): a `jax.sharding.Mesh` over ICI
plays the role of the Cartesian communicator; named axes replace ranks.

The default topology is a 1D 'shard' axis (slab decomposition): particle
arrays shard along N, mesh arrays shard along their leading (x) axis --
collectives ride ICI exactly where MPI_Alltoallv/Sendrecv/Allreduce did
(SURVEY.md section 2.6 mapping table).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

SHARD_AXIS = "shard"


def make_mesh(n_devices: int | None = None, axis_name: str = SHARD_AXIS,
              devices=None) -> Mesh:
    """1D device mesh over all (or the first n) devices."""
    devs = list(devices if devices is not None else jax.devices())
    if n_devices is not None:
        if n_devices > len(devs):
            raise ValueError(
                f"requested {n_devices} devices, have {len(devs)}")
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis_name,))


X_AXIS, Y_AXIS = "shx", "shy"


def make_mesh2d(shape: tuple[int, int] | None = None,
                axis_names: tuple[str, str] = (X_AXIS, Y_AXIS),
                devices=None) -> Mesh:
    """2D device mesh for pencil decompositions (the reference's
    MPI_Dims_create 2D/3D cartesian grids, domain_decomposition.cpp:10-112).
    `shape=None` picks the most-square factorization of the device count."""
    devs = list(devices if devices is not None else jax.devices())
    if shape is None:
        n = len(devs)
        dx = int(np.floor(np.sqrt(n)))
        while n % dx:
            dx -= 1
        shape = (dx, n // dx)
    dx, dy = shape
    if dx * dy > len(devs):
        raise ValueError(f"mesh {shape} needs {dx*dy} devices, "
                         f"have {len(devs)}")
    return Mesh(np.asarray(devs[:dx * dy]).reshape(dx, dy), axis_names)


Z_AXIS = "shz"
AXES_3D = (X_AXIS, Y_AXIS, Z_AXIS)


def make_mesh3d(shape: tuple[int, int, int] | None = None,
                axis_names: tuple[str, str, str] = AXES_3D,
                devices=None) -> Mesh:
    """3D device mesh for block decompositions -- the full analogue of
    the reference's MPI_Dims_create(3) Cartesian communicator
    (domain_decomposition.cpp:10-112). `shape=None` picks the most-cubic
    factorization of the device count."""
    devs = list(devices if devices is not None else jax.devices())
    if shape is None:
        n = len(devs)
        dx = max(d for d in range(1, int(round(n ** (1 / 3))) + 1)
                 if n % d == 0)
        rem = n // dx
        dy = int(np.floor(np.sqrt(rem)))
        while rem % dy:
            dy -= 1
        shape = (dx, dy, rem // dy)
    dx, dy, dz = shape
    if dx * dy * dz > len(devs):
        raise ValueError(f"mesh {shape} needs {dx*dy*dz} devices, "
                         f"have {len(devs)}")
    return Mesh(np.asarray(devs[:dx * dy * dz]).reshape(dx, dy, dz),
                axis_names)


def axis_size(mesh: Mesh, axis_name) -> int:
    """Device count along a mesh axis, or the flattened product for a
    tuple of axes (3D block meshes)."""
    if isinstance(axis_name, tuple):
        n = 1
        for a in axis_name:
            n *= mesh.shape[a]
        return n
    return mesh.shape[axis_name]


def particle_sharding(mesh: Mesh, axis_name=SHARD_AXIS):
    """[N, ...] arrays sharded along N. `axis_name` may be a tuple of
    mesh axes (2D mesh: particles sharded over the flattened device
    grid)."""
    return NamedSharding(mesh, P(axis_name))


def grid_sharding(mesh: Mesh, axis_name: str = SHARD_AXIS):
    """[ng, ng, ng] mesh arrays sharded along x-slabs."""
    return NamedSharding(mesh, P(axis_name, None, None))


def replicated(mesh: Mesh):
    return NamedSharding(mesh, P())


def shard_state(state, mesh: Mesh, axis_name: str = SHARD_AXIS):
    """Place a SimState on the mesh: particle arrays sharded along N,
    scalars replicated. N must divide the device count."""
    ps = particle_sharding(mesh, axis_name)
    rep = replicated(mesh)
    return state.replace(
        positions=jax.device_put(state.positions, ps),
        velocities=jax.device_put(state.velocities, ps),
        masses=jax.device_put(state.masses, ps),
        scale_factor=jax.device_put(state.scale_factor, rep),
        time=jax.device_put(state.time, rep),
        step=jax.device_put(state.step, rep),
        rng_key=jax.device_put(state.rng_key, rep),
    )
