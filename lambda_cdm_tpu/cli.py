"""Command-line interface: run / resume / info / bench.

The reference's `lambda_cdm_sim` main() only printed a feature banner
(src/main.cpp:4-40); this CLI actually runs config-driven simulations:

    python -m lambda_cdm_tpu run examples/configs/basic_lambda_cdm.json \\
        --time.initial_timestep=1e-5 --particles.num_particles=32768
    python -m lambda_cdm_tpu resume output/checkpoint_000100.npz
    python -m lambda_cdm_tpu info                 # device/feature banner
    python -m lambda_cdm_tpu validate cfg.json    # schema check only

Any --dotted.path=value argument overrides config
(ConfigurationManager::apply_command_line_overrides capability,
configuration_manager.hpp:105). LCDM_* environment variables override too.
"""

from __future__ import annotations

import argparse
import sys


def _build_engine(config, with_observers=True):
    from .core.analysis_observers import build_observers_from_config
    from .core.engine import SimulationEngine
    from .core.observers import ProgressObserver

    observers = [ProgressObserver(every=config.simulation.output_frequency)]
    if with_observers:
        observers += build_observers_from_config(config)
    return SimulationEngine(config, observers=observers)


def cmd_run(argv) -> int:
    from .core.config import SimulationConfig

    if not argv or argv[0].startswith("--"):
        config = SimulationConfig()
        rest = list(argv)
    else:
        config = SimulationConfig.from_file(argv[0])
        rest = argv[1:]
    config.apply_env_overrides()
    rest = config.apply_cli_overrides(rest)
    if rest:
        print(f"warning: unrecognized arguments {rest}", file=sys.stderr)
    config.validate()

    engine = _build_engine(config)
    engine.initialize()
    engine.run()
    stats = engine.statistics
    print(f"final: steps={stats.total_steps} "
          f"z={stats.current_redshift:.4f} "
          f"{stats.particle_updates_per_second:.3e} particle-steps/s")
    return 0


def cmd_resume(argv) -> int:
    from .core.config import SimulationConfig

    if not argv:
        print("usage: resume <checkpoint.npz> [--overrides]",
              file=sys.stderr)
        return 2
    path, rest = argv[0], argv[1:]
    from .utils.checkpoint import load_checkpoint
    state, cfg_dict, stats = load_checkpoint(path)
    config = SimulationConfig.from_dict(cfg_dict) if cfg_dict \
        else SimulationConfig()
    config.apply_env_overrides()
    config.apply_cli_overrides(rest)
    engine = _build_engine(config)
    engine.initialize(state=state)
    engine.run()
    print(f"resumed from step {int(state.step)} -> "
          f"{engine.statistics.total_steps} more steps")
    return 0


def cmd_info(argv) -> int:
    """Feature/device banner (the reference main.cpp capability, done
    honestly)."""
    import jax

    from . import __version__
    from .forces import available_force_computers

    print(f"lambda_cdm_tpu {__version__}")
    print(f"jax {jax.__version__}")
    devs = jax.devices()
    print(f"devices: {len(devs)} x {devs[0].platform} "
          f"({devs[0].device_kind})")
    print(f"force computers: {', '.join(available_force_computers())}")
    print("capabilities: cosmology, zeldovich/2lpt ICs, KDK leapfrog,")
    print("  direct/PM/TreePM gravity (Pallas on TPU), P(k), FoF+SO halos,")
    print("  lensing raytracer, multi-chip sharding, checkpoint/resume")
    return 0


def cmd_validate(argv) -> int:
    from .core.config import SimulationConfig

    if not argv:
        print("usage: validate <config.json>", file=sys.stderr)
        return 2
    config = SimulationConfig.from_file(argv[0])
    config.validate()
    print(f"{argv[0]}: valid "
          f"(N={config.particles.num_particles}, "
          f"box={config.particles.box_size}, "
          f"solver={config.forces.type})")
    return 0


COMMANDS = {"run": cmd_run, "resume": cmd_resume, "info": cmd_info,
            "validate": cmd_validate}


def main(argv=None) -> int:
    argv = sys.argv[1:] if argv is None else list(argv)
    if not argv or argv[0] in ("-h", "--help"):
        print(__doc__)
        return 0
    cmd = argv[0]
    if cmd not in COMMANDS:
        print(f"unknown command {cmd!r}; choose from {sorted(COMMANDS)}",
              file=sys.stderr)
        return 2
    return COMMANDS[cmd](argv[1:])


if __name__ == "__main__":
    raise SystemExit(main())
