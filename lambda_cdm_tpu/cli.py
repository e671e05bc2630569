"""Command-line interface: run / resume / info / bench.

The reference's `lambda_cdm_sim` main() only printed a feature banner
(src/main.cpp:4-40); this CLI actually runs config-driven simulations:

    python -m lambda_cdm_tpu run examples/configs/basic_lambda_cdm.json \\
        --time.initial_timestep=1e-5 --particles.num_particles=32768
    python -m lambda_cdm_tpu resume output/checkpoint_000100.npz
    python -m lambda_cdm_tpu info                 # device/feature banner
    python -m lambda_cdm_tpu validate cfg.json    # schema check only
    python -m lambda_cdm_tpu analyze snap.npz --pk-out pk.txt \\
        --halos-out halos.npz                     # offline P(k)+halos

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


def cmd_analyze(argv) -> int:
    """Offline analysis of a saved snapshot: P(k) + FoF/SO halo catalog
    (the reference's analysis layer as a standalone pipeline;
    power_spectrum.cu:182-316, halo_finder.cpp:15-444)."""
    import argparse as ap

    p = ap.ArgumentParser(prog="analyze")
    p.add_argument("snapshot", help="snapshot/checkpoint file (npz/"
                                    "lcdm/hdf5)")
    p.add_argument("--box-size", type=float, default=None,
                   help="box size if the snapshot lacks config")
    p.add_argument("--ng", type=int, default=256,
                   help="P(k) mesh resolution")
    p.add_argument("--num-bins", type=int, default=64)
    p.add_argument("--max-halos", type=int, default=None,
                   help="catalog capacity (default: auto-size from the "
                        "qualifying group count)")
    p.add_argument("--min-particles", type=int, default=20)
    p.add_argument("--linking-length", type=float, default=0.2,
                   help="FoF b in units of the mean separation")
    p.add_argument("--pk-out", default=None,
                   help="write P(k) table (ascii) here")
    p.add_argument("--halos-out", default=None,
                   help="write halo catalog (npz) here")
    args = p.parse_args(argv)

    import numpy as np

    from .analysis.halo_finder import find_halos, mass_function
    from .analysis.power_spectrum import (measure_power_spectrum,
                                          save_power_spectrum,
                                          sigma8_from_power)
    from .utils.checkpoint import load_snapshot

    state, meta = load_snapshot(args.snapshot)
    box = args.box_size
    if box is None:
        box = ((meta or {}).get("config", {})
               .get("particles", {}).get("box_size"))
    if box is None:
        print("snapshot carries no config: pass --box-size",
              file=sys.stderr)
        return 2
    n_live = int(np.sum(np.asarray(state.masses) > 0))
    print(f"{args.snapshot}: N={n_live} box={box} "
          f"a={float(state.scale_factor):.4f} step={int(state.step)}")

    pk = measure_power_spectrum(state.positions, float(box), ng=args.ng,
                                weights=state.masses,
                                num_bins=args.num_bins, deconvolve=True,
                                subtract_shot_noise=True)
    s8 = float(sigma8_from_power(pk))
    kk = np.asarray(pk.k)
    pp = np.asarray(pk.power)
    good = np.asarray(pk.counts) > 0
    print(f"P(k): {int(good.sum())} bins, "
          f"k=[{kk[good].min():.3f}, {kk[good].max():.3f}], "
          f"sigma8(snapshot)={s8:.4f}")
    if args.pk_out:
        save_power_spectrum(args.pk_out, pk)
        print(f"wrote {args.pk_out}")

    cat = find_halos(state.positions, state.velocities, state.masses,
                     float(box),
                     linking_length_factor=args.linking_length,
                     min_particles=args.min_particles,
                     max_halos=args.max_halos)
    nh = int(cat.num_halos)
    print(f"halos: {nh} with >= {args.min_particles} particles")
    if nh:
        top = np.argsort(-np.asarray(cat.mass)[:nh])[:5]
        for i in top:
            print(f"  M={float(cat.mass[i]):.3e} "
                  f"R200={float(cat.radius[i]):.3f} "
                  f"vmax={float(cat.v_max[i]):.1f} "
                  f"np={int(cat.n_particles[i])} "
                  f"at {np.round(np.asarray(cat.center[i]), 2)}")
        centers, dndlnm, counts = mass_function(cat, float(box))
        occ = counts > 0
        print(f"mass function: {int(occ.sum())} occupied bins")
    if args.halos_out:
        np.savez(args.halos_out,
                 num_halos=nh,
                 n_particles=np.asarray(cat.n_particles)[:nh],
                 center=np.asarray(cat.center)[:nh],
                 velocity=np.asarray(cat.velocity)[:nh],
                 mass=np.asarray(cat.mass)[:nh],
                 radius=np.asarray(cat.radius)[:nh],
                 v_max=np.asarray(cat.v_max)[:nh],
                 angular_momentum=np.asarray(cat.angular_momentum)[:nh],
                 spin=np.asarray(cat.spin)[:nh],
                 particle_label=np.asarray(cat.particle_label))
        print(f"wrote {args.halos_out}")
    return 0


COMMANDS = {"run": cmd_run, "resume": cmd_resume, "info": cmd_info,
            "validate": cmd_validate, "analyze": cmd_analyze}


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
