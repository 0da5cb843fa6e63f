"""Microbenchmark the chip: elementwise FMA throughput by shape, transcendental
cost, gather cost — calibrates what the blast path can theoretically hit."""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np


def timeit(name, fn, *args, n=50):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n
    return dt


def chain_fma(depth):
    def f(x):
        y = x
        for i in range(depth):
            y = y * 1.0001 + 0.0001
        return y

    return f


def main():
    N = 102400
    for shape in [(N,), (N // 128, 128), (800, 128), (100, 8, 128), (65, N)]:
        x = jnp.ones(shape, jnp.float32)
        f = jax.jit(chain_fma(200))
        dt = timeit(f"fma", f, x)
        flops = 2 * 200 * int(np.prod(shape))
        print(f"chained FMA x200 shape {str(shape):16s}: {dt*1e6:8.1f} us  {flops/dt/1e9:8.1f} GFLOP/s")

    x = jnp.ones((N,), jnp.float32)
    for name, fn in [
        ("sin", jnp.sin), ("sqrt", jnp.sqrt), ("atan2", lambda v: jnp.arctan2(v, v + 1)),
    ]:
        f = jax.jit(lambda v, fn=fn: fn(v))
        dt = timeit(name, f, x)
        print(f"{name} on (102400,): {dt*1e6:8.1f} us")

    # gather rows (self-collision pattern): (65, N) -> (818, N) x2
    src = jnp.ones((65, N // 32), jnp.float32)
    idx = jnp.asarray(np.random.randint(0, 65, 818), dtype=jnp.int32)
    f = jax.jit(lambda s: s[idx] - s[idx[::-1]])
    dt = timeit("gather", f, src)
    print(f"row-gather 818 rows of (65, 3200): {dt*1e6:8.1f} us")

    # a single big fused kernel doing ~600 mixed ops on (N,)
    def big(x):
        y = x
        for i in range(100):
            y = y * 1.0001 + x * 0.999
            y = jnp.minimum(y, 2.0)
            y = jnp.maximum(y, -2.0)
        return y

    f = jax.jit(big)
    dt = timeit("big", f, jnp.ones((N,), jnp.float32))
    print(f"400-op mixed kernel on (102400,): {dt*1e6:8.1f} us")

    # many SEPARATE small arrays (the blast pattern: ~60 live (N,) arrays)
    xs = [jnp.ones((3200,), jnp.float32) for _ in range(64)]

    def many(*xs):
        return sum(x * 1.001 + 0.1 for x in xs)

    f = jax.jit(many)
    dt = timeit("many", f, *xs)
    print(f"64 separate (3200,) arrays summed: {dt*1e6:8.1f} us")


if __name__ == "__main__":
    main()
