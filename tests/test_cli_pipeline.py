"""End-to-end: staged CLI (remcmc -> parse -> rdf -> neural -> post) and the
fused on-device pipeline, on a miniature LJ (P,T) grid."""

import glob
import json
import os

import numpy as np
import pytest

from neuralmelting_tpu.config import RunConfig


MINI = dict(
    name="t", element="LJ", ncells=(4, 4, 4),
    npress=2, ntemp=6,
    press=(1.0, 4.0),
    temp=tuple(np.linspace(0.4, 1.6, 6)),
    nsmpl=8, mod=4, ncut=2, seed=3,
    dpos0=0.1, dvol0=0.01,
)


@pytest.mark.slow
def test_staged_cli_end_to_end(tmp_path, capsys):
    from neuralmelting_tpu.cli import remcmc, parse, rdf, neural, post

    out = str(tmp_path / "out")
    remcmc.main(["-n", "t", "-e", "LJ", "-ss", "4",
                 "-pn", "2", "-pr", "1.0", "4.0",
                 "-tn", "6", "-tr", "0.4", "1.6",
                 "-sn", "8", "-sm", "4", "-sc", "2",
                 "-sd", "3", "-o", out])
    msg = capsys.readouterr().out
    summary = json.loads(msg.strip().splitlines()[-1])
    assert summary["diag"] == 0
    thrm = sorted(glob.glob(os.path.join(out, "t.lj.fcc.4x4x4.*.thrm")))
    traj_files = sorted(glob.glob(os.path.join(out, "t.lj.fcc.4x4x4.*.traj")))
    assert len(thrm) == 12 and len(traj_files) == 12
    assert os.path.exists(os.path.join(out, "t.lj.ckpt.npz"))

    parse.main(["-i", out, "-n", "t", "-e", "LJ"])
    parsed = os.path.join(out, "t.lj.fcc.4x4x4.parsed.npz")
    assert os.path.exists(parsed)
    z = np.load(parsed)
    assert z["pe"].shape == (2, 6, 8)
    assert z["positions"].shape == (2, 6, 8, 256, 3)
    # thermo temps per slot must be constant and match the grid
    temps = z["temp"]
    for p in range(2):
        np.testing.assert_allclose(temps[p, :, 0],
                                   np.linspace(0.4, 1.6, 6), rtol=1e-5)
        for t in range(6):
            assert np.ptp(temps[p, t]) < 1e-6

    rdf.main(["-i", parsed, "--nbins", "32", "--cut", "2"])
    rdfz = parsed.replace(".parsed.npz", ".rdf.npz")
    assert os.path.exists(rdfz)
    zr = np.load(rdfz, allow_pickle=True)
    assert zr["g_mean"].shape == (2, 6, 32)

    neural.main(["-i", rdfz, "--model", "mlp", "--epochs", "150",
                 "--band", "1"])
    meltz = rdfz.replace(".rdf.npz", ".melt.npz")
    zm = np.load(meltz)
    assert zm["tm"].shape == (2,)
    assert np.isfinite(zm["tm"]).all()

    post.main(["-i", meltz, "-e", "LJ"])
    assert os.path.exists(meltz.replace(".melt.npz", ".curve.png"))


@pytest.mark.slow
def test_fused_pipeline_runs(tmp_path):
    from neuralmelting_tpu.pipeline import melting_pipeline

    cfg = RunConfig(**MINI)
    res = melting_pipeline(cfg, nbins=32, model="mlp", epochs=150, band=1)
    assert res.diag == 0
    assert res.probs.shape == (2, 6)
    assert res.tm.shape == (2,)
    assert np.isfinite(res.tm).all()
    # cold end must look more solid than hot end on average
    assert res.probs[:, 0].mean() < res.probs[:, -1].mean()


def test_checkpoint_roundtrip(tmp_path):
    import jax
    import jax.numpy as jnp
    from neuralmelting_tpu.io import checkpoint as ckpt
    from neuralmelting_tpu.models.lattice import make_supercell
    from neuralmelting_tpu.models.lj import LJCut
    from neuralmelting_tpu.sampler.state import ensemble_init

    pot = LJCut.create()
    pos, box = make_supercell("fcc", 1.6, 2)
    states = ensemble_init(pot, pos, box, 9, jnp.array([0.5, 1.0]),
                           jnp.array([1.0, 2.0]), 0.1, 0.01, 0.005)
    slot_of = jnp.array([1, 0], jnp.int32)
    path = str(tmp_path / "ck.npz")
    ckpt.save(path, states, slot_of, config_json='{"x": 1}')
    s2, so2, cj, extra = ckpt.load(path)
    np.testing.assert_array_equal(np.asarray(so2), [1, 0])
    np.testing.assert_allclose(np.asarray(s2.pos), np.asarray(states.pos))
    assert json.loads(cj)["x"] == 1
    # keys restored: same next random number
    a = jax.random.uniform(states.key[0])
    b = jax.random.uniform(s2.key[0])
    np.testing.assert_allclose(float(a), float(b))


@pytest.mark.slow
def test_cli_restart_resumes_consistently(tmp_path, capsys):
    """--restart must rebuild position-derived caches from the checkpoint."""
    from neuralmelting_tpu.cli import remcmc

    out = str(tmp_path / "o1")
    argv = ["-n", "r", "-e", "LJ", "-ss", "4", "-pn", "1",
            "-tn", "4", "-tr", "0.5", "1.4", "-sn", "4", "-sm", "3",
            "-sd", "9"]
    remcmc.main(argv + ["-o", out])
    ck = os.path.join(out, "r.lj.ckpt.npz")
    assert os.path.exists(ck)

    out2 = str(tmp_path / "o2")
    remcmc.main(argv + ["-o", out2, "--restart", ck])
    msg = capsys.readouterr().out
    summary = json.loads(msg.strip().splitlines()[-1])
    assert summary["diag"] == 0
    # resumed run continues with finite physics from the restored state
    thrm = glob.glob(os.path.join(out2, "r.lj.fcc.4x4x4.*.thrm"))
    assert len(thrm) == 4
    from neuralmelting_tpu.io import thermo
    _, d = thermo.read(sorted(thrm)[0])
    assert np.isfinite(d["pe"]).all()
    # energies should be near the checkpointed equilibrium, not the
    # fresh-lattice value (the original bug ran the first sweeps with
    # lattice-built caches)
    assert d["pe"][0] / 256 < -4.0
