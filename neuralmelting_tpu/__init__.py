"""neuralmelting_tpu — a TPU-native melting-curve engine.

A ground-up JAX/XLA/Pallas re-design of the capabilities of the reference
pipeline ``walkernr/neuralMelting`` (LAMMPS-backed REMCMC melting-point
estimation; see SURVEY.md):

* NPT Metropolis Monte Carlo (atom displacement, volume, and hybrid-MC moves)
  as a jitted ``lax.scan`` — the reference's per-move Python->LAMMPS round
  trip (SURVEY.md §3.1) is replaced by on-device incremental energies.
* Lennard-Jones and tabulated (setfl) EAM potentials evaluated on device.
* A (pressure, temperature) replica ensemble vmapped / shard_mapped over a
  ``jax.sharding.Mesh`` with parallel-tempering exchanges.
* On-device structural features (RDF g(r), structure factor S(q), density)
  and a neural solid/liquid phase classifier producing melting curves.
* Reference-style text thermo/trajectory formats for bit-comparable physics.
"""

__version__ = "0.1.0"

from neuralmelting_tpu import units  # noqa: F401
