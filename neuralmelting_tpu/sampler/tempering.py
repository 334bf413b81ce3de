"""Parallel-tempering replica exchange (SURVEY.md §2.4 'Replica exchange').

The reference gathered all dask futures each cycle and swapped whole
configurations centrally (SURVEY.md §3.1). On a TPU mesh, moving (N,3)
configurations between devices is the wrong currency: configurations stay
put and the *(T, P) slot identities* move instead. We maintain

    slot_of: (R,) int32,  replica index -> grid-slot index,

and an exchange event permutes slots between neighbor pairs of the (P, T)
grid using the general NPT tempering weight

    ln A = (beta_i - beta_j)(E_i - E_j)
         + p2e * (beta_i P_i - beta_j P_j)(V_i - V_j),

which supports exchanges along both the T and the P axis. Pairing is the
deterministic even/odd alternation standard in tempering implementations
(the reference's centralized random pairing does not map to collectives;
this changes mixing order, not the stationary distribution — deviation
documented per SURVEY.md §7 Phase 6).

Slot-attached quantities (temp, press, step sizes, window counters) are
re-scattered to the replicas that now own the slots; everything is O(R)
scalars, so under sharding it runs replicated from an all-gather of E and V.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _pair_partner(length: int, phase: int):
    """partner[t] for even/odd pairing: (phase, phase+1), (phase+2, ...)."""
    t = jnp.arange(length)
    left = (t % 2 == phase % 2) & (t + 1 < length)
    right = (t % 2 == (phase + 1) % 2) & (t - 1 >= 0)
    return jnp.where(left, t + 1, jnp.where(right, t - 1, t))


def propose_swaps(e_slot, v_slot, t_slot, p_slot, npress, ntemp,
                  axis: int, phase: int, key, kb: float, p2e: float):
    """One exchange event on the slot grid.

    Args:
      e_slot, v_slot: (R,) energy and volume per grid slot (slot order).
      t_slot, p_slot: (R,) slot temperatures and pressures (constants).
      axis: 1 to pair along T (within a pressure), 0 along P.
      phase: 0/1 even-odd alternation.
    Returns:
      sigma: (R,) slot permutation — slot s takes the state of slot sigma[s].
      n_acc: () number of accepted swaps.
    """
    shape = (npress, ntemp)

    def grid(x):
        g = x.reshape(shape)
        return g.T if axis == 0 else g

    def ungrid(g):
        g = g.T if axis == 0 else g
        return g.reshape(-1)

    e = grid(e_slot)
    v = grid(v_slot)
    beta = 1.0 / (kb * grid(t_slot))
    betap = beta * grid(p_slot) * p2e

    length = e.shape[1]
    partner = _pair_partner(length, phase)           # (L,)
    pe_j = e[:, partner]
    pv_j = v[:, partner]
    pbeta_j = beta[:, partner]
    pbetap_j = betap[:, partner]

    ln_acc = ((beta - pbeta_j) * (e - pe_j)
              + (betap - pbetap_j) * (v - pv_j))

    # one uniform per unordered pair, shared by both members: draw on the
    # full grid in slot coordinates, then take the left member's draw
    t_idx = jnp.arange(length)
    is_left = (t_idx % 2 == phase % 2) & (t_idx + 1 < length)
    u = jax.random.uniform(key, e.shape, jnp.float32, 1e-38, 1.0)
    u_pair = jnp.where(is_left[None, :], u, u[:, partner])
    swap = (jnp.log(u_pair) < ln_acc) & (partner != t_idx)[None, :]
    # both members agree on ln_acc (antisymmetric sum) and on u_pair
    sigma_col = jnp.where(swap, partner[None, :], t_idx[None, :])

    rows = jnp.broadcast_to(jnp.arange(e.shape[0])[:, None], e.shape)
    flat_sigma = grid(jnp.arange(npress * ntemp))[rows, sigma_col]
    sigma = ungrid(flat_sigma)
    n_acc = jnp.sum(swap & is_left[None, :])
    return sigma, n_acc


def apply_exchange(states, slot_of, sigma, t_grid, p_grid):
    """Permute slot ownership and re-scatter slot-attached fields.

    ``sigma`` is the slot permutation from propose_swaps. Step sizes and
    window counters stay attached to the (T, P) slot (they are tuned to the
    thermodynamic condition, not to the configuration).
    """
    r = slot_of.shape[0]
    perm = jnp.argsort(slot_of)          # slot -> replica (old)
    new_perm = perm[sigma]               # slot -> replica (new)

    slot_ids = jnp.arange(r, dtype=jnp.int32)
    new_slot_of = jnp.zeros((r,), jnp.int32).at[new_perm].set(slot_ids)

    def to_new_owner(values_slot):
        return jnp.zeros_like(values_slot).at[new_perm].set(values_slot)

    # slot-attached scalars, re-scattered to the new owner replicas
    updates = dict(
        temp=to_new_owner(jnp.asarray(t_grid, jnp.float32)),
        press=to_new_owner(jnp.asarray(p_grid, jnp.float32)),
    )
    for f in ("dpos", "dvol", "dt", "nap", "ntp", "nav", "ntv", "nah", "nth"):
        old = getattr(states, f)
        updates[f] = to_new_owner(old[perm])
    return states.replace(**updates), new_slot_of


def exchange_event(states, slot_of, key, event_idx, npress, ntemp,
                   t_grid, p_grid, kb, p2e):
    """Full exchange: cycles phases [T0, T1, P0, P1] by event index."""
    perm = jnp.argsort(slot_of)
    e_slot = states.pe[perm]
    v_slot = jnp.prod(states.box, axis=-1)[perm]

    def run_axis(axis, phase):
        return propose_swaps(e_slot, v_slot, t_grid, p_grid, npress, ntemp,
                             axis, phase, key, kb, p2e)

    # static 4-way cycle keeps everything shape-stable under jit
    branch = event_idx % (4 if npress > 1 else 2)
    sigma, n_acc = jax.lax.switch(
        branch,
        [lambda: run_axis(1, 0), lambda: run_axis(1, 1)]
        + ([lambda: run_axis(0, 0), lambda: run_axis(0, 1)]
           if npress > 1 else []),
    )
    states, slot_of = apply_exchange(states, slot_of, sigma, t_grid, p_grid)
    return states, slot_of, n_acc
