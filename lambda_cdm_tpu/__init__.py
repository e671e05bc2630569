"""lambda_cdm_tpu: a TPU-native Lambda-CDM cosmological N-body framework.

Brand-new JAX/XLA/Pallas/pjit implementation of the capability surface of
the reference CUDA/C++ project `ixaxaar/lambda-cdm-raytracing`
(see SURVEY.md): background cosmology, Zel'dovich/2LPT initial conditions,
pluggable gravity solvers (direct pairwise via a Pallas tiled kernel,
particle-mesh FFT Poisson, TreePM), comoving KDK leapfrog integration,
on-device analysis (power spectra, FoF/SO halo finding), gravitational
lensing raytracing, multi-chip sharding over a device mesh, checkpointing,
and a config-driven builder/observer API.
"""

__version__ = "0.1.0"

from .core.analysis_observers import (ConservationObserver,
                                      HaloFinderObserver, LensingObserver,
                                      PowerSpectrumObserver,
                                      SnapshotObserver,
                                      build_observers_from_config)
from .core.config import SimulationConfig
from .core.engine import (LifecycleState, SimulationBuilder,
                          SimulationEngine, SimulationStatistics)
from .core.observers import (EnergyMonitor, MetricsRecorder, Observer,
                             ProgressObserver)
from .core.state import SimState, make_state, random_state
from .physics.cosmology import CosmologyParams, PLANCK

__all__ = [
    "__version__",
    "SimulationConfig", "SimulationBuilder", "SimulationEngine",
    "SimulationStatistics", "LifecycleState",
    "Observer", "ProgressObserver", "EnergyMonitor", "MetricsRecorder",
    "SnapshotObserver", "PowerSpectrumObserver", "HaloFinderObserver",
    "LensingObserver", "ConservationObserver",
    "build_observers_from_config",
    "SimState", "make_state", "random_state",
    "CosmologyParams", "PLANCK",
]
