"""CLI surface: info / validate / analyze driven through cli.main
(the reference's main.cpp printed a banner; ours runs the pipeline)."""

import json

import jax
import pytest
import jax.numpy as jnp
import numpy as np

from lambda_cdm_tpu import cli
from lambda_cdm_tpu.core.state import make_state
from lambda_cdm_tpu.utils.checkpoint import save_snapshot


pytestmark = pytest.mark.slow  # heavy tier: > ~30 s on one core (smoke cover in test_smoke_fast.py)

def _clustered_state(n_blob=300, n_field=2000, box=100.0):
    blobs = []
    for i, c in enumerate([(20, 20, 20), (70, 70, 70)]):
        blobs.append(jnp.asarray(c, jnp.float32)
                     + 1.0 * jax.random.normal(jax.random.PRNGKey(i),
                                               (n_blob, 3)))
    field = jax.random.uniform(jax.random.PRNGKey(9), (n_field, 3),
                               maxval=box)
    pos = jnp.mod(jnp.concatenate(blobs + [field]), box)
    n = pos.shape[0]
    vel = 0.05 * jax.random.normal(jax.random.PRNGKey(10), (n, 3))
    return make_state(pos, vel, jnp.ones((n,)), scale_factor=1.0)


def test_info_runs(capsys):
    assert cli.main(["info"]) == 0
    out = capsys.readouterr().out
    assert "force computers" in out


def test_validate_example_config(capsys):
    assert cli.main(["validate",
                     "examples/configs/basic_lambda_cdm.json"]) == 0
    assert "valid" in capsys.readouterr().out


def test_analyze_snapshot(tmp_path, capsys):
    state = _clustered_state()
    snap = str(tmp_path / "snap.npz")
    save_snapshot(snap, state)
    pk_out = str(tmp_path / "pk.txt")
    halos_out = str(tmp_path / "halos.npz")
    rc = cli.main(["analyze", snap, "--box-size", "100.0",
                   "--ng", "64", "--linking-length", "0.3",
                   "--pk-out", pk_out, "--halos-out", halos_out])
    assert rc == 0
    out = capsys.readouterr().out
    assert "halos: 2 " in out, out
    # artifacts written and loadable
    with open(pk_out) as fh:
        assert len(fh.readlines()) > 10
    halos = np.load(halos_out)
    assert int(halos["num_halos"]) == 2
    assert halos["radius"].shape == (2,)
    assert np.all(halos["radius"] > 0)
    assert halos["particle_label"].shape[0] == 2600


def test_analyze_needs_box_size(tmp_path, capsys):
    state = _clustered_state(n_blob=30, n_field=100)
    snap = str(tmp_path / "s.npz")
    save_snapshot(snap, state)
    assert cli.main(["analyze", snap]) == 2


def test_analyze_box_from_config(tmp_path, capsys):
    from lambda_cdm_tpu.core.config import SimulationConfig
    state = _clustered_state(n_blob=60, n_field=200)
    cfg = SimulationConfig()
    cfg.particles.box_size = 100.0
    snap = str(tmp_path / "s2.npz")
    save_snapshot(snap, state, config=cfg)
    rc = cli.main(["analyze", snap, "--ng", "32",
                   "--linking-length", "0.3"])
    assert rc == 0
    assert "box=100.0" in capsys.readouterr().out
