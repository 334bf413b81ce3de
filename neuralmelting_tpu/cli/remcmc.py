"""Stage 1 — REMCMC sampling (reference: lammps_remcmc.py).

Runs the replica-exchange NPT Monte Carlo ensemble on the available
accelerator and writes per-(P,T) .thrm/.traj text files + a checkpoint.

    python -m neuralmelting_tpu.cli.remcmc -e LJ -ss 4 -pn 4 -tn 16 -o out/
"""

from __future__ import annotations

import argparse
import json
import os
import time

from neuralmelting_tpu import runner
from neuralmelting_tpu.cli.common import add_run_args, config_from_args


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    add_run_args(ap)
    ap.add_argument("-o", "--outdir", default="output")
    ap.add_argument("--no-traj", action="store_true")
    ap.add_argument("--engine", default="gather",
                    choices=("gather", "dense", "cellmc"),
                    help="dense = gather-free MXU sampler (LJ only); "
                         "cellmc = whole-sweep Pallas cell kernels "
                         "(LJ stride-2, EAM stride-3 Chebyshev)")
    ap.add_argument("--restart", default=None,
                    help="checkpoint .npz to resume from")
    ap.add_argument("--profile", default=None, metavar="DIR",
                    help="capture a jax.profiler trace of the sampling "
                         "chunk into DIR (open with xprof/tensorboard; "
                         "kernel-level time attribution - SURVEY.md §5)")
    ap.add_argument("--coordinator", default=None, metavar="HOST:PORT",
                    help="multi-host runs: JAX multi-controller "
                         "coordinator address (launch one process per "
                         "host with --nprocs/--procid). The ensemble is "
                         "sharded over the global replica mesh: gather "
                         "engine via GSPMD, cellmc (LJ and EAM) via the "
                         "shard_map wrapper (parallel/cellmc_sharded.py); "
                         "each host samples its shard, process 0 writes "
                         "all outputs. The dense engine is "
                         "single-process only.")
    ap.add_argument("--nprocs", type=int, default=None)
    ap.add_argument("--procid", type=int, default=None)
    args = ap.parse_args(argv)
    if args.coordinator:
        from neuralmelting_tpu.parallel.mesh import init_multihost
        init_multihost(args.coordinator, args.nprocs, args.procid)
    cfg = config_from_args(args)

    t0 = time.time()
    setup = runner.setup_run(cfg, setfl=args.setfl, engine=args.engine)
    if args.restart:
        setup = runner.restore_setup(setup, args.restart)
        print(f"resumed from {args.restart}")
    os.makedirs(args.outdir, exist_ok=True)
    ckpath = os.path.join(args.outdir, f"{cfg.name}.{cfg.element.lower()}.ckpt.npz")
    from neuralmelting_tpu.utils import MetricsLogger
    metrics = MetricsLogger(os.path.join(args.outdir, "metrics.jsonl"),
                            run_id=cfg.name)
    import contextlib
    import jax as _jax
    prof = (_jax.profiler.trace(args.profile) if args.profile
            else contextlib.nullcontext())
    with prof:
        setup, recs, frames, hist, xacc, diag = runner.run_sampling(
            setup, outdir=args.outdir, checkpoint_path=ckpath,
            write_traj=not args.no_traj, metrics=metrics)
    if args.profile:
        print(f"profiler trace written to {args.profile}")
    import numpy as np

    # states stay replica-sharded after a multi-host run: gather the
    # counter over DCN (a COLLECTIVE — every process calls it) before
    # touching it, then let process 0 alone print the summary
    from neuralmelting_tpu.parallel.mesh import host_fetch
    nmoves = int(np.asarray(host_fetch(setup.states.ntp)).sum())
    if _jax.process_index() == 0:
        print(json.dumps({
            "outdir": args.outdir, "records": int(cfg.nsmpl),
            "replicas": int(len(setup.press) * len(setup.temp)),
            "natoms": setup.natoms, "diag": int(diag),
            "attempted_position_moves": nmoves,
            "exchange_acceptances": [int(x) for x in np.asarray(xacc)],
            "seconds": round(time.time() - t0, 2),
        }))


if __name__ == "__main__":
    main()
