"""WorldKeyedCache semantics (solver/_cache.py): kernels are cached per
obstacle-capacity envelope with world VALUES flowing in as runtime inputs.

Regression tests for the round-1 cache bugs: a single-entry cache rebuilt
(minutes of TPU compile) when alternating between two worlds, and an
id()-based fast path could return a stale kernel for a freed world's
recycled id."""

import jax.numpy as jnp
import numpy as np

from curobo_tpu.geom import types as gt
from curobo_tpu.geom import world as wm
from curobo_tpu.solver._cache import WorldKeyedCache, world_envelope


def _world(n_cuboids=1, x=0.5):
    obs = [
        gt.Cuboid(name=f"c{i}", pose=[x + 0.1 * i, 0, 0, 1, 0, 0, 0], dims=[0.2, 0.2, 0.2])
        for i in range(n_cuboids)
    ]
    return wm.compile_scene(gt.Scene().add(*obs), capacities={"cuboid": max(n_cuboids, 2)})


class TestWorldKeyedCache:
    def test_same_envelope_shares_one_build(self):
        builds = []
        cache = WorldKeyedCache(lambda w: builds.append(1) or object())
        w1 = _world(x=0.5)
        w2 = _world(x=0.9)  # different VALUES, same capacity envelope
        s1 = cache.get(w1)
        s2 = cache.get(w2)
        assert s1 is s2
        assert len(builds) == 1

    def test_alternating_worlds_never_rebuild(self):
        # the round-1 failure mode: flip-flopping between two worlds
        builds = []
        cache = WorldKeyedCache(lambda w: builds.append(1) or object())
        w1 = _world(n_cuboids=1)
        w2 = _world(n_cuboids=4)  # different capacity -> different kernel
        for _ in range(5):
            cache.get(w1)
            cache.get(w2)
        assert len(builds) == 2

    def test_distinct_capacity_distinct_entry(self):
        w1 = _world(n_cuboids=1)
        w2 = _world(n_cuboids=4)
        assert world_envelope(w1) != world_envelope(w2)
        cache = WorldKeyedCache(lambda w: object())
        assert cache.get(w1) is not cache.get(w2)

    def test_lru_eviction(self):
        builds = []
        cache = WorldKeyedCache(lambda w: builds.append(1) or object(), max_entries=2)
        worlds = [_world(n_cuboids=n) for n in (1, 3, 5)]
        for w in worlds:
            cache.get(w)
        assert len(builds) == 3
        cache.get(worlds[2])  # still cached
        cache.get(worlds[1])  # still cached
        assert len(builds) == 3
        cache.get(worlds[0])  # evicted -> rebuilds
        assert len(builds) == 4

    def test_no_identity_dependence(self):
        # recycled object ids must be irrelevant: keying is by shapes only
        cache = WorldKeyedCache(lambda w: object())
        first = cache.get(_world(x=0.1))  # temporary, freed immediately
        again = cache.get(_world(x=0.7))  # new object, same envelope
        assert first is again
