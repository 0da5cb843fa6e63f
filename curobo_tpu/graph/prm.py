"""Batched PRM graph planner: device-batched feasibility, host graph search.

Parity: reference `PRMGraphPlanner` (`curobo/_src/graph_planner/
graph_planner_prm.py:39`): Halton node sampling, batched node/edge collision
checking through the rollout (device), NetworkX shortest path (CPU), path
pruning, interpolated seed trajectories for trajopt
(`motion_planner.py:386` graph seeding).

TPU design: node validation and all edge sweeps are single fused batched
collision queries (the expensive part); only the sparse shortest-path runs
on host (scipy.sparse.csgraph.dijkstra — the reference also goes to CPU
for this, `NetworkXPathFinder`).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from scipy.sparse import csr_matrix
from scipy.sparse.csgraph import dijkstra

from curobo_tpu.geom import world as world_mod
from curobo_tpu.geom.self_collision import self_collision_distance
from curobo_tpu.robot import kinematics as kin_mod
from curobo_tpu.robot.params import KinematicsParams
from curobo_tpu.util.sampling import halton_sequence


@dataclasses.dataclass(frozen=True)
class PRMConfig:
    n_nodes: int = 384
    k_neighbors: int = 10
    edge_substeps: int = 8  # collision checks per edge
    max_path_nodes: int = 12  # fixed output path length (padded by repeats)
    collision_margin: float = 0.0


@dataclasses.dataclass
class PRMResult:
    paths: jnp.ndarray  # (B, max_path_nodes, D) waypoints (padded)
    success: np.ndarray  # (B,) bool
    path_lengths: np.ndarray  # (B,) joint-space lengths


class PRMGraphPlanner:
    def __init__(self, params: KinematicsParams, cfg: PRMConfig = PRMConfig()):
        self.params = params
        self.cfg = cfg
        lo = np.asarray(params.joint_limits.lower)
        hi = np.asarray(params.joint_limits.upper)
        lo_c = np.maximum(lo, -np.pi)
        hi_c = np.minimum(hi, np.pi)
        h = halton_sequence(cfg.n_nodes, params.n_dof)
        self._nodes = jnp.asarray(lo_c + (hi_c - lo_c) * h, dtype=jnp.float32)
        self._check_q = jax.jit(self._check_configs)
        self._check_edges = jax.jit(self._check_edge_batch)

    # ------------------------------------------------------------------
    def _check_configs(self, world, q):  # (..., D) -> (...,) bool collision-free
        st = kin_mod.compute_kinematics(self.params, q)
        clear = world_mod.sphere_clearance(world, st.spheres)
        live = st.spheres[..., 3] >= 0
        hit = jnp.any((clear < self.cfg.collision_margin) & live, axis=-1)
        self_d = self_collision_distance(self.params.self_collision, st.spheres)
        return ~(hit | (self_d > 0))

    def _check_edge_batch(self, world, qa, qb):  # (E, D),(E, D) -> (E,) bool free
        K = self.cfg.edge_substeps
        alphas = jnp.linspace(0.0, 1.0, K)[:, None, None]
        pts = qa[None] * (1 - alphas) + qb[None] * alphas  # (K, E, D)
        ok = self._check_configs(world, pts)  # (K, E)
        return jnp.all(ok, axis=0)

    def _edges_free(self, world, qa: np.ndarray, qb: np.ndarray) -> np.ndarray:
        """Edge sweep with POWER-OF-2 shape buckets: the edge count is
        data-dependent (kNN over the valid nodes of THIS world), so calling
        the jit at the raw count recompiles per world — observed as ~3 s
        per first graph-seeded retry on TPU. Padding rows repeat edge 0
        (any valid config pair); results are sliced back."""
        E = len(qa)
        if E == 0:
            return np.zeros(0, dtype=bool)
        epad = max(256, 1 << (E - 1).bit_length())
        qa_p = np.broadcast_to(qa[0], (epad,) + qa.shape[1:]).copy()
        qb_p = np.broadcast_to(qb[0], (epad,) + qb.shape[1:]).copy()
        qa_p[:E] = qa
        qb_p[:E] = qb
        free = np.asarray(
            self._check_edges(world, jnp.asarray(qa_p), jnp.asarray(qb_p))
        )
        return free[:E]

    # ------------------------------------------------------------------
    def plan(
        self,
        world: world_mod.WorldData,
        q_start: jnp.ndarray,  # (B, D)
        q_goal: jnp.ndarray,  # (B, D)
    ) -> PRMResult:
        cfg = self.cfg
        p = self.params
        B, D = q_start.shape
        N = cfg.n_nodes
        world = world.anonymized()  # names are static jit keys

        # 1. validate roadmap nodes (shared across problems — same world)
        node_ok = np.asarray(self._check_q(world, self._nodes))  # (N,)
        nodes = np.asarray(self._nodes)

        # 2. kNN candidate edges among valid nodes
        dist = np.linalg.norm(nodes[:, None] - nodes[None], axis=-1)  # (N, N)
        dist[~node_ok] = np.inf
        dist[:, ~node_ok] = np.inf
        np.fill_diagonal(dist, np.inf)
        knn = np.argsort(dist, axis=-1)[:, : cfg.k_neighbors]
        ea, eb = [], []
        for i in range(N):
            if not node_ok[i]:
                continue
            for j in knn[i]:
                if np.isfinite(dist[i, j]) and i < j:
                    ea.append(i)
                    eb.append(j)
        ea = np.asarray(ea, dtype=np.int64)
        eb = np.asarray(eb, dtype=np.int64)

        # 3. batched edge collision sweep (device, shape-bucketed)
        if len(ea):
            free = self._edges_free(world, nodes[ea], nodes[eb])
            ea, eb = ea[free], eb[free]

        # 4. connect per-problem start/goal to their k nearest valid nodes
        qs = np.asarray(q_start)
        qg = np.asarray(q_goal)
        all_sa, all_sb, s_owner = [], [], []  # start/goal edge lists
        for b in range(B):
            for q_end, base_idx in ((qs[b], N + 2 * b), (qg[b], N + 2 * b + 1)):
                d = np.linalg.norm(nodes - q_end, axis=-1)
                d[~node_ok] = np.inf
                near = np.argsort(d)[: cfg.k_neighbors]
                for j in near:
                    if np.isfinite(d[j]):
                        all_sa.append(base_idx)
                        all_sb.append(j)
                        s_owner.append(b)
        all_sa = np.asarray(all_sa, dtype=np.int64)
        all_sb = np.asarray(all_sb, dtype=np.int64)
        endpoints = np.stack(
            [v for b in range(B) for v in (qs[b], qg[b])]
        )  # (2B, D)
        if len(all_sa):
            free = self._edges_free(world, endpoints[all_sa - N], nodes[all_sb])
            all_sa, all_sb = all_sa[free], all_sb[free]

        # 5. per-problem dijkstra on the shared graph + its own endpoints
        n_total = N + 2 * B
        rows = np.concatenate([ea, eb, all_sa, all_sb])
        cols = np.concatenate([eb, ea, all_sb, all_sa])
        node_pos = np.concatenate([nodes, endpoints], axis=0)
        w = np.linalg.norm(node_pos[rows] - node_pos[cols], axis=-1)
        graph = csr_matrix((w, (rows, cols)), shape=(n_total, n_total))

        paths = np.zeros((B, cfg.max_path_nodes, D), dtype=np.float32)
        success = np.zeros(B, dtype=bool)
        lengths = np.full(B, np.inf, dtype=np.float32)
        starts = np.asarray([N + 2 * b for b in range(B)])
        dists, preds = dijkstra(
            graph, indices=starts, return_predecessors=True
        )
        for b in range(B):
            goal_idx = N + 2 * b + 1
            if not np.isfinite(dists[b, goal_idx]):
                # fallback: straight line (lets trajopt try anyway)
                alphas = np.linspace(0, 1, cfg.max_path_nodes)[:, None]
                paths[b] = qs[b] * (1 - alphas) + qg[b] * alphas
                continue
            # reconstruct
            chain = [goal_idx]
            while chain[-1] != starts[b]:
                chain.append(preds[b, chain[-1]])
            chain = chain[::-1]
            wp = node_pos[chain]
            # resample to fixed node count by arc length
            seg = np.linalg.norm(np.diff(wp, axis=0), axis=-1)
            cum = np.concatenate([[0], np.cumsum(seg)])
            t = np.linspace(0, cum[-1], cfg.max_path_nodes)
            out = np.stack(
                [np.interp(t, cum, wp[:, d]) for d in range(D)], axis=-1
            )
            paths[b] = out
            success[b] = True
            lengths[b] = cum[-1]

        return PRMResult(
            paths=jnp.asarray(paths), success=success, path_lengths=lengths
        )
