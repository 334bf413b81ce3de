"""Multi-controller (DCN) plumbing — single-process semantics.

SURVEY.md §2.3: the reference's dask Client/LocalCluster scale-out maps
to the standard JAX multi-controller runtime. Real multi-process runs
need multiple hosts; these tests pin the single-process contract the
runner relies on (no-op init, identity fetch, writer gating True).
"""

import jax
import jax.numpy as jnp

from neuralmelting_tpu.parallel.mesh import host_fetch, init_multihost


def test_init_multihost_noop():
    init_multihost(None)          # must not touch jax.distributed
    assert jax.process_count() == 1


def test_host_fetch_identity_single_process():
    tree = {"a": jnp.arange(4.0), "b": (None, jnp.ones((2, 3)))}
    out = host_fetch(tree)
    assert out["a"] is tree["a"] and out["b"][1] is tree["b"][1]


def test_run_sampling_writer_gating_single_process(tmp_path):
    # the write path must still produce files when process_count == 1
    from neuralmelting_tpu import runner
    from neuralmelting_tpu.config import RunConfig

    cfg = RunConfig(name="mh", element="LJ", ncells=(4, 4, 4),
                    npress=1, ntemp=2, press=(1.0,), temp=(0.7, 1.3),
                    nsmpl=1, mod=2, seed=3)
    setup = runner.setup_run(cfg, engine="gather")
    outdir = str(tmp_path)
    setup, recs, frames, hist, xacc, diag = runner.run_sampling(
        setup, outdir=outdir, write_traj=False,
        checkpoint_path=str(tmp_path / "mh.ckpt.npz"))
    thrm = list(tmp_path.glob("*.thrm"))
    assert len(thrm) == 2 and (tmp_path / "mh.ckpt.npz").exists()
