"""Batched PRM graph planner: device-batched feasibility, host graph search.

Parity: reference `PRMGraphPlanner` (`curobo/_src/graph_planner/
graph_planner_prm.py:39`): Halton node sampling, batched node/edge collision
checking through the rollout (device), roadmap GROWTH with random +
ellipsoidal informed sampling when start/goal fail to connect
(`graph_planner_prm.py:190-223`), NetworkX shortest path (CPU), path
shortcutting (`path_pruner.py`), interpolated seed trajectories for trajopt
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
    # roadmap growth when start/goal fail to connect (reference
    # `graph_planner_prm.py:190-223`): each round adds `growth_nodes`
    # samples — `informed_fraction` of them from the prolate hyperspheroid
    # around the unconnected start-goal pairs (informed / ellipsoidal
    # sampling), the rest uniform — then re-wires and re-searches.
    growth_rounds: int = 2
    growth_nodes: int = 128
    informed_fraction: float = 0.7
    # transverse diameter of the informed spheroid as a multiple of the
    # start-goal distance (no incumbent path length is known yet)
    informed_scale: float = 1.8
    # path shortcutting passes (reference `path_pruner.py`): try to bypass
    # intermediate waypoints with direct collision-checked edges
    shortcut_rounds: int = 2


@dataclasses.dataclass
class PRMResult:
    paths: jnp.ndarray  # (B, max_path_nodes, D) waypoints (padded)
    success: np.ndarray  # (B,) bool
    path_lengths: np.ndarray  # (B,) joint-space lengths


class PRMGraphPlanner:
    def __init__(self, params: KinematicsParams, cfg: PRMConfig = PRMConfig()):
        self.params = params
        self.cfg = cfg
        lo, hi = params.dof_clip_bounds(angular_cap=np.pi)
        self._lo, self._hi = np.asarray(lo), np.asarray(hi)
        h = halton_sequence(cfg.n_nodes, params.n_dof)
        self._nodes = jnp.asarray(
            self._lo + (self._hi - self._lo) * h, dtype=jnp.float32
        )
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
        """Swept edge check: discrete configs at K substeps PLUS a
        conservative sphere 'bubble' between consecutive substeps (midpoint
        sphere inflated by half the sphere's travel), so thin obstacles
        cannot be tunneled between samples (reference swept-sphere
        `LinearConnector`, `graph_planner_prm.py` / wp_sweep kernel)."""
        K = self.cfg.edge_substeps
        alphas = jnp.linspace(0.0, 1.0, K)[:, None, None]
        pts = qa[None] * (1 - alphas) + qb[None] * alphas  # (K, E, D)
        st = kin_mod.compute_kinematics(self.params, pts)
        sph = st.spheres  # (K, E, S, 4)
        live = sph[..., 3] >= 0
        clear = world_mod.sphere_clearance(world, sph)
        hit = jnp.any((clear < self.cfg.collision_margin) & live, axis=-1)
        self_d = self_collision_distance(self.params.self_collision, sph)
        ok_cfg = ~(hit | (self_d > 0))  # (K, E)
        # swept bubble between consecutive substeps
        c0, c1 = sph[:-1], sph[1:]
        mid = 0.5 * (c0[..., :3] + c1[..., :3])
        travel = jnp.linalg.norm(c1[..., :3] - c0[..., :3], axis=-1)
        infl = c0[..., 3] + 0.5 * travel
        bubble = jnp.concatenate([mid, infl[..., None]], axis=-1)
        bclear = world_mod.sphere_clearance(world, bubble)
        bhit = jnp.any(
            (bclear < self.cfg.collision_margin) & live[:-1], axis=-1
        )  # (K-1, E)
        return jnp.all(ok_cfg, axis=0) & jnp.all(~bhit, axis=0)

    def _configs_free(self, world, q: np.ndarray) -> np.ndarray:
        """Node check with POWER-OF-2 shape buckets (no retrace per count)."""
        n = len(q)
        if n == 0:
            return np.zeros(0, dtype=bool)
        npad = max(128, 1 << (n - 1).bit_length())
        qp = np.broadcast_to(q[0], (npad,) + q.shape[1:]).copy()
        qp[:n] = q
        return np.asarray(self._check_q(world, jnp.asarray(qp)))[:n]

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
    def _informed_samples(
        self, rng, q_start: np.ndarray, q_goal: np.ndarray, n: int
    ) -> np.ndarray:
        """Uniform samples inside the prolate hyperspheroid with foci
        (q_start, q_goal) and transverse diameter `informed_scale * ||g-s||`
        (the informed-RRT* set restricted to the joint box). Reference:
        ellipsoidal node sampling, `graph_planner_prm.py:190-223`."""
        D = q_start.shape[-1]
        c_min = np.linalg.norm(q_goal - q_start)
        c_max = max(self.cfg.informed_scale * c_min, c_min + 1e-6)
        center = 0.5 * (q_start + q_goal)
        # rotation taking e1 -> transverse axis (Householder-ish basis)
        a1 = (q_goal - q_start) / max(c_min, 1e-9)
        M = np.eye(D)
        M[:, 0] = a1
        Q, _ = np.linalg.qr(M)
        # qr may flip the first column's sign
        if np.dot(Q[:, 0], a1) < 0:
            Q[:, 0] = -Q[:, 0]
        r1 = c_max / 2.0
        rk = np.sqrt(max(c_max**2 - c_min**2, 1e-12)) / 2.0
        radii = np.full(D, rk)
        radii[0] = r1
        # uniform in the unit D-ball
        u = rng.normal(size=(n, D))
        u /= np.linalg.norm(u, axis=-1, keepdims=True)
        u *= rng.uniform(size=(n, 1)) ** (1.0 / D)
        pts = center + (u * radii) @ Q.T
        return np.clip(pts, self._lo, self._hi).astype(np.float32)

    def _knn_edges(self, nodes: np.ndarray, node_ok: np.ndarray, lo: int = 0):
        """kNN candidate edges among valid nodes; with lo > 0, only pairs
        touching nodes[lo:] (incremental wiring of grown nodes)."""
        N = len(nodes)
        dist = np.linalg.norm(nodes[:, None] - nodes[None], axis=-1)
        dist[~node_ok] = np.inf
        dist[:, ~node_ok] = np.inf
        np.fill_diagonal(dist, np.inf)
        knn = np.argsort(dist, axis=-1)[:, : self.cfg.k_neighbors]
        ea, eb = [], []
        for i in range(N):
            if not node_ok[i]:
                continue
            for j in knn[i]:
                if not np.isfinite(dist[i, j]):
                    continue
                a, b = (i, j) if i < j else (j, i)
                if b < lo:  # both endpoints pre-existing: already wired
                    continue
                ea.append(a)
                eb.append(b)
        if not ea:
            return (np.zeros(0, np.int64),) * 2
        pairs = np.unique(np.stack([ea, eb], axis=-1), axis=0)
        return pairs[:, 0], pairs[:, 1]

    def _endpoint_edges(self, nodes, node_ok, endpoints, which):
        """Candidate connections endpoint -> k nearest valid nodes.
        `which` = iterable of endpoint indices (into endpoints) to wire."""
        sa, sb = [], []
        for e in which:
            d = np.linalg.norm(nodes - endpoints[e], axis=-1)
            d[~node_ok] = np.inf
            near = np.argsort(d)[: self.cfg.k_neighbors]
            for j in near:
                if np.isfinite(d[j]):
                    sa.append(e)
                    sb.append(j)
        return np.asarray(sa, np.int64), np.asarray(sb, np.int64)

    def _shortcut(self, world, wp: np.ndarray) -> np.ndarray:
        """Greedy path shortcutting (reference `path_pruner.py`): one
        batched sweep checks every skip edge (i, j>i+1); then walk from the
        start always jumping to the farthest reachable waypoint."""
        M = len(wp)
        if M <= 2:
            return wp
        pairs = [(i, j) for i in range(M - 2) for j in range(i + 2, M)]
        ia = np.asarray([p[0] for p in pairs])
        ib = np.asarray([p[1] for p in pairs])
        free = self._edges_free(world, wp[ia], wp[ib])
        ok = {}
        for (i, j), f in zip(pairs, free):
            ok[(i, j)] = bool(f)
        out = [0]
        i = 0
        while i < M - 1:
            nxt = i + 1
            for j in range(M - 1, i + 1, -1):
                if ok.get((i, j), False):
                    nxt = j
                    break
            out.append(nxt)
            i = nxt
        return wp[out]

    # ------------------------------------------------------------------
    def plan(
        self,
        world: world_mod.WorldData,
        q_start: jnp.ndarray,  # (B, D)
        q_goal: jnp.ndarray,  # (B, D)
    ) -> PRMResult:
        cfg = self.cfg
        B, D = q_start.shape
        world = world.anonymized()  # names are static jit keys
        rng = np.random.RandomState(0)

        # 1. validate the base roadmap (shared across problems — same world)
        nodes = np.asarray(self._nodes)
        node_ok = self._configs_free(world, nodes)

        # 2-3. kNN candidate edges + batched edge collision sweep
        ea, eb = self._knn_edges(nodes, node_ok)
        if len(ea):
            free = self._edges_free(world, nodes[ea], nodes[eb])
            ea, eb = ea[free], eb[free]

        qs = np.asarray(q_start)
        qg = np.asarray(q_goal)
        endpoints = np.stack(
            [v for b in range(B) for v in (qs[b], qg[b])]
        )  # (2B, D)

        def wire_endpoints(which):
            sa, sb = self._endpoint_edges(nodes, node_ok, endpoints, which)
            if len(sa):
                free = self._edges_free(world, endpoints[sa], nodes[sb])
                sa, sb = sa[free], sb[free]
            return sa, sb

        all_sa, all_sb = wire_endpoints(range(2 * B))

        def search():
            n_total = len(nodes) + 2 * B
            rows = np.concatenate([ea, eb, all_sa + len(nodes), all_sb])
            cols = np.concatenate([eb, ea, all_sb, all_sa + len(nodes)])
            node_pos = np.concatenate([nodes, endpoints], axis=0)
            w = np.linalg.norm(node_pos[rows] - node_pos[cols], axis=-1)
            graph = csr_matrix((w, (rows, cols)), shape=(n_total, n_total))
            starts = np.asarray([len(nodes) + 2 * b for b in range(B)])
            dists, preds = dijkstra(
                graph, indices=starts, return_predecessors=True
            )
            return node_pos, starts, dists, preds

        node_pos, starts, dists, preds = search()
        unconnected = [
            b for b in range(B)
            if not np.isfinite(dists[b, len(nodes) + 2 * b + 1])
        ]

        # 4. roadmap growth for unconnected problems: informed (ellipsoidal)
        #    samples around each unconnected (start, goal) pair + uniform
        for _ in range(cfg.growth_rounds):
            if not unconnected:
                break
            per = max(cfg.growth_nodes // max(len(unconnected), 1), 8)
            new = []
            for b in unconnected:
                ni = int(per * cfg.informed_fraction)
                new.append(self._informed_samples(rng, qs[b], qg[b], ni))
                nu = per - ni
                new.append(
                    rng.uniform(self._lo, self._hi, (nu, D)).astype(np.float32)
                )
            new = np.concatenate(new, axis=0)
            new_ok = self._configs_free(world, new)
            lo_idx = len(nodes)
            nodes = np.concatenate([nodes, new], axis=0)
            node_ok = np.concatenate([node_ok, new_ok])
            # incremental wiring: only edges touching the new nodes
            na, nb = self._knn_edges(nodes, node_ok, lo=lo_idx)
            if len(na):
                free = self._edges_free(world, nodes[na], nodes[nb])
                na, nb = na[free], nb[free]
                ea = np.concatenate([ea, na])
                eb = np.concatenate([eb, nb])
            # re-wire endpoints of the unconnected problems
            which = [i for b in unconnected for i in (2 * b, 2 * b + 1)]
            sa, sb = wire_endpoints(which)
            all_sa = np.concatenate([all_sa, sa])
            all_sb = np.concatenate([all_sb, sb])
            node_pos, starts, dists, preds = search()
            unconnected = [
                b for b in range(B)
                if not np.isfinite(dists[b, len(nodes) + 2 * b + 1])
            ]

        # 5. extract + shortcut + fixed-length resample
        paths = np.zeros((B, cfg.max_path_nodes, D), dtype=np.float32)
        success = np.zeros(B, dtype=bool)
        lengths = np.full(B, np.inf, dtype=np.float32)
        for b in range(B):
            goal_idx = len(nodes) + 2 * b + 1
            if not np.isfinite(dists[b, goal_idx]):
                # fallback: straight line (lets trajopt try anyway)
                alphas = np.linspace(0, 1, cfg.max_path_nodes)[:, None]
                paths[b] = qs[b] * (1 - alphas) + qg[b] * alphas
                continue
            chain = [goal_idx]
            while chain[-1] != starts[b]:
                chain.append(preds[b, chain[-1]])
            chain = chain[::-1]
            wp = node_pos[chain]
            for _ in range(cfg.shortcut_rounds):
                pruned = self._shortcut(world, wp)
                if len(pruned) == len(wp):
                    break
                wp = pruned
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
