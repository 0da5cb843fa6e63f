"""Layout experiment: (B, ..., 3, 3) einsum FK vs B-last scalar-expanded FK.

Hypothesis (from profile_tpu.py): FK at 1.9 ms/3200 configs is层 padding
waste — each (3, 3) trailing-dim op pads toward (8, 128) tiles. The B-last
formulation keeps every intermediate as a (B,) vector (lane-aligned) and
unrolls the 3x3 algebra into scalar FMAs, which XLA fuses into a handful of
elementwise kernels.
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from curobo_tpu.robot import kinematics as kin_mod
from curobo_tpu.robot.kinematics import Kinematics
from curobo_tpu.robot.params import JOINT_PRISMATIC, JOINT_REVOLUTE


def timeit(name, fn, *args, n=50):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n * 1000
    print(f"{name:50s} {dt:8.3f} ms")
    return out


def build_blast_fk(params):
    """FK with all intermediates as (B,) vectors; unrolled over links."""
    import numpy as onp

    L = params.n_links
    fixed_rot = onp.asarray(params.fixed_rot)  # (L, 3, 3) static
    fixed_pos = onp.asarray(params.fixed_pos)
    axes = onp.asarray(params.joint_axis)
    mult = onp.asarray(params.mimic_mult)
    off = onp.asarray(params.mimic_offset)
    jt = params.joint_type
    dof = params.dof_idx
    parents = params.parent_idx
    sph_c = onp.asarray(params.sphere_centers)
    sph_link = params.sphere_link_idx

    def fk(qT):  # qT: (D, B)
        B = qT.shape[-1]
        one = jnp.ones(qT.shape[1:], qT.dtype)
        zero = jnp.zeros_like(one)
        # per-link global R (list of 9 (B,) arrays) and p (3 (B,) arrays)
        Rg = [None] * L
        pg = [None] * L
        for i in range(L):
            # joint value
            if dof[i] >= 0 and mult[i] != 0.0:
                val = mult[i] * qT[dof[i]] + off[i]
            else:
                val = None  # constant joint
            F = fixed_rot[i]
            fp = fixed_pos[i]
            if jt[i] == JOINT_REVOLUTE and val is not None:
                c = jnp.cos(val)
                s = jnp.sin(val)
                ax, ay, az = axes[i]
                # Rodrigues for constant axis: R = cI + s[K] + (1-c)aa^T
                r = [
                    c + (1 - c) * ax * ax, (1 - c) * ax * ay - s * az, (1 - c) * ax * az + s * ay,
                    (1 - c) * ax * ay + s * az, c + (1 - c) * ay * ay, (1 - c) * ay * az - s * ax,
                    (1 - c) * ax * az - s * ay, (1 - c) * ay * az + s * ax, c + (1 - c) * az * az,
                ]
                # local = F @ R_joint (F static scalars)
                Rl = [
                    F[r0][0] * r[0 + c0] + F[r0][1] * r[3 + c0] + F[r0][2] * r[6 + c0]
                    for r0 in range(3)
                    for c0 in range(3)
                ]
                pl = [fp[0] * one, fp[1] * one, fp[2] * one]
            else:
                # fixed (or locked revolute folded on host would go here;
                # keep simple: constant local transform)
                Rl = [F[r0][c0] * one for r0 in range(3) for c0 in range(3)]
                pl = [fp[0] * one, fp[1] * one, fp[2] * one]
            p_ = parents[i]
            if p_ < 0:
                Rg[i] = Rl
                pg[i] = pl
            else:
                Rp = Rg[p_]
                pp = pg[p_]
                Rg[i] = [
                    Rp[3 * r0] * Rl[c0] + Rp[3 * r0 + 1] * Rl[3 + c0] + Rp[3 * r0 + 2] * Rl[6 + c0]
                    for r0 in range(3)
                    for c0 in range(3)
                ]
                pg[i] = [
                    Rp[3 * r0] * pl[0] + Rp[3 * r0 + 1] * pl[1] + Rp[3 * r0 + 2] * pl[2] + pp[r0]
                    for r0 in range(3)
                ]
        # spheres: (S, B) per coord
        sx, sy, sz = [], [], []
        for s in range(len(sph_link)):
            li = sph_link[s]
            cx, cy, cz = sph_c[s]
            R = Rg[li]
            p = pg[li]
            sx.append(R[0] * cx + R[1] * cy + R[2] * cz + p[0])
            sy.append(R[3] * cx + R[4] * cy + R[5] * cz + p[1])
            sz.append(R[6] * cx + R[7] * cy + R[8] * cz + p[2])
        spheres = jnp.stack(sx + sy + sz)  # (3S, B)
        ti = params.tool_frame_idx[0]
        tool = jnp.stack(Rg[ti] + pg[ti])  # (12, B)
        return spheres, tool

    return fk


def main():
    kin = Kinematics.from_robot_yaml("curobo_tpu/content/robots/franka.yml")
    p = kin.params
    B = 3200
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.uniform(-1, 1, (B, 7)), dtype=jnp.float32)
    qT = jnp.asarray(q.T)  # (7, B)

    # baseline: trivial dispatch
    triv = jax.jit(lambda x: x + 1.0)
    timeit("trivial jit dispatch (3200,)", triv, q[:, 0])

    fk_cur = jax.jit(lambda q: kin_mod.compute_kinematics(p, q).spheres)
    timeit("current FK+spheres (B,...,3,3) layout", fk_cur, q)

    fk_bl = jax.jit(build_blast_fk(p))
    out = timeit("B-last scalar-expanded FK+spheres", fk_bl, qT)

    # correctness check
    sp_cur = np.asarray(fk_cur(q))  # (B, S, 4)
    sp_bl = np.asarray(out[0])  # (3S, B)
    S = p.n_spheres
    err = np.abs(sp_bl[:S].T - sp_cur[:, :, 0]).max()
    err = max(err, np.abs(sp_bl[S : 2 * S].T - sp_cur[:, :, 1]).max())
    err = max(err, np.abs(sp_bl[2 * S :].T - sp_cur[:, :, 2]).max())
    print(f"max sphere coordinate error vs current FK: {err:.2e}")

    # gradient timing
    g_cur = jax.jit(jax.grad(lambda q: jnp.sum(kin_mod.compute_kinematics(p, q).spheres[..., :3] ** 2)))
    timeit("current FK grad", g_cur, q)
    g_bl = jax.jit(jax.grad(lambda qT: jnp.sum(fk_bl(qT)[0] ** 2)))
    timeit("B-last FK grad", g_bl, qT)

    # larger fold (line search 7x)
    q7 = jnp.asarray(rng.uniform(-1, 1, (7 * B, 7)), dtype=jnp.float32)
    timeit("current FK at 22400", fk_cur, q7)
    timeit("B-last FK at 22400", fk_bl, jnp.asarray(q7.T))


if __name__ == "__main__":
    main()
