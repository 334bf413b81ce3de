"""Uniform potential interface used by the samplers.

Dispatches between pair potentials (LJ) and many-body EAM at trace time so
one sweep implementation serves both (the reference switched LAMMPS pair
styles per element; SURVEY.md §2 row 3). ``aux`` is potential-specific
cached state threaded through the sampler: empty for pair potentials, the
per-atom density cache rho (N,) for EAM.
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import jax.numpy as jnp

from neuralmelting_tpu.ops import eam_energy as EE
from neuralmelting_tpu.ops import neighbors as NB


@dataclasses.dataclass(frozen=True)
class PotentialOps:
    kind: str
    range_factor: float                 # cell sizing: rc * range_factor
    init_aux: Callable                  # (pot, pos, box, nl) -> aux
    total: Callable                     # (pot, pos, box, nl) -> (pe, vir)
    delta: Callable                     # (pot,pos,box,nl,aux,ids,new_r)
                                        #   -> (de, dw, payload)
    apply_accept: Callable              # (aux, ids, acc, payload) -> aux
    forces: Callable                    # (pot, pos, box, nl) -> (N,3)


def _pair_delta(pot, pos, box, nl, aux, ids, new_r):
    de, dw = NB.delta_moves(pot, pos, box, nl, ids, new_r)
    return de, dw, ()


pair_ops = PotentialOps(
    kind="pair",
    range_factor=1.0,
    init_aux=lambda pot, pos, box, nl: jnp.zeros((0,), jnp.float32),
    total=NB.pair_energy_virial,
    delta=_pair_delta,
    apply_accept=lambda aux, ids, acc, payload: aux,
    forces=NB.forces,
)


def _eam_delta(pot, pos, box, nl, aux, ids, new_r):
    return EE.delta_moves(pot, pos, box, nl, aux, ids, new_r)


eam_ops = PotentialOps(
    kind="eam",
    range_factor=2.0,
    init_aux=lambda pot, pos, box, nl: EE.rho_sums(pot, pos, box, nl),
    total=EE.total_energy_virial,
    delta=_eam_delta,
    apply_accept=lambda aux, ids, acc, payload: EE.apply_accept(
        aux, ids, acc, payload),
    forces=EE.forces,
)


def ops_for(pot) -> PotentialOps:
    return eam_ops if getattr(pot, "kind", "pair") == "eam" else pair_ops


def ops_for_style(style: str) -> PotentialOps:
    return eam_ops if style == "eam" else pair_ops
