"""Keyed cache for Pallas solver kernels.

The mega-kernels (`ops/pallas_ik.py`, `ops/pallas_traj.py`) take the world
VALUES as runtime SMEM inputs but are compiled per obstacle-CAPACITY
envelope (the static shapes of the world stores) — a rebuild costs minutes
of TPU compile. Solvers therefore cache built kernels per envelope: any
number of different worlds with the same store shapes share one kernel,
and obstacle moves/enables/swaps never rebuild.

Design (fixes the round-1 single-entry / raw-id() cache):
- multi-entry dict keyed by the shape envelope, LRU-evicted;
- keys are pure shape tuples — no device->host content pulls.

Parity note: the reference's CUDA-graph capture cache
(`curobo/_src/solver/solver_base.py`) is likewise keyed by shape; world
values flow through updated collision buffers (`collision_scene.py:459`).
"""

from __future__ import annotations

from collections import OrderedDict
from typing import Callable

import jax


def world_envelope(world) -> tuple:
    """Static shape envelope over every array leaf of the world pytree."""
    return tuple(tuple(leaf.shape) for leaf in jax.tree_util.tree_leaves(world))


class WorldKeyedCache:
    """build_fn(world) -> solver, cached by world shape envelope (LRU)."""

    def __init__(self, build_fn: Callable, max_entries: int = 8):
        self._build = build_fn
        self._max = max_entries
        self._entries: OrderedDict[tuple, object] = OrderedDict()

    def get(self, world):
        key = world_envelope(world)
        if key in self._entries:
            self._entries.move_to_end(key)
        else:
            if len(self._entries) >= self._max:
                self._entries.popitem(last=False)
            self._entries[key] = self._build(world)
        return self._entries[key]

    # -- compile-failure quarantine ------------------------------------
    # A Mosaic edge case (register spill, unsupported op) surfaces as a
    # JaxRuntimeError on the first call for a given envelope. Solvers mark
    # the envelope broken and permanently route it to the XLA fallback
    # path, so one bad kernel shape can never take down a whole run.
    def mark_broken(self, world) -> None:
        self._entries[("broken",) + world_envelope(world)] = True

    def is_broken(self, world) -> bool:
        return ("broken",) + world_envelope(world) in self._entries
