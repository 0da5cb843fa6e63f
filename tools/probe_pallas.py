"""Feasibility probe: vjp-inside-pallas + static gather + trig on TPU."""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def main():
    D, SUB, LANE = 7, 8, 128
    S = 65
    pairs = np.random.RandomState(0).randint(0, S, (818, 2)).astype(np.int32)

    def cost_fn(q):  # q: (D, SUB, LANE)
        # FK-ish: trig chain
        acc = jnp.zeros((SUB, LANE), q.dtype)
        xs = []
        for d in range(D):
            c = jnp.cos(q[d])
            s = jnp.sin(q[d])
            acc = acc + c * s
            xs.append(c + 0.1 * s)
        sph = jnp.stack(xs * 10)[:S]  # (S, SUB, LANE)
        # static row gather (self-collision pattern)
        a = sph[pairs[:, 0]]
        b = sph[pairs[:, 1]]
        d2 = (a - b) ** 2
        viol = jnp.maximum(0.1 - jnp.sqrt(d2 + 1e-12), 0.0)
        return acc + jnp.sum(viol, axis=0)

    def kernel(q_ref, cost_ref, grad_ref):
        q = q_ref[0]
        c, vjp = jax.vjp(cost_fn, q)
        (g,) = vjp(jnp.ones_like(c))
        cost_ref[0] = c
        grad_ref[0] = g

    NB = 25  # 25 * 1024 = 25600 configs
    q = jnp.asarray(np.random.RandomState(1).randn(NB, D, SUB, LANE), dtype=jnp.float32)

    f = pl.pallas_call(
        kernel,
        grid=(NB,),
        in_specs=[pl.BlockSpec((1, D, SUB, LANE), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM)],
        out_specs=[
            pl.BlockSpec((1, SUB, LANE), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D, SUB, LANE), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((NB, SUB, LANE), jnp.float32),
            jax.ShapeDtypeStruct((NB, D, SUB, LANE), jnp.float32),
        ],
    )
    fj = jax.jit(f)
    t0 = time.time()
    c, g = fj(q)
    jax.block_until_ready((c, g))
    print("compile+run ok:", time.time() - t0, "s; cost", c.shape, "grad", g.shape)

    # correctness vs plain jax
    c_ref, vjp = jax.vjp(jax.vmap(cost_fn), q)
    (g_ref,) = vjp(jnp.ones_like(c_ref))
    print("cost err", float(jnp.max(jnp.abs(c - c_ref))))
    print("grad err", float(jnp.max(jnp.abs(g - g_ref))))

    t0 = time.perf_counter()
    n = 50
    for _ in range(n):
        c, g = fj(q)
    jax.block_until_ready((c, g))
    dt = (time.perf_counter() - t0) / n
    print(f"fused fwd+bwd on {NB*SUB*LANE} configs: {dt*1e6:.1f} us")


if __name__ == "__main__":
    main()
