"""MAC — maximize algebraic connectivity under an edge budget, on TPU.

Re-design of the reference's vendored MAC solver
(/root/reference/cslam/mac/mac.py): Frank-Wolfe maximization of
lambda_2(L(w)) subject to |w| = k over candidate edge weights w in [0,1]^m.
Semantics preserved:

- supergradient grad_k = weight_k * (v_i - v_j)^2 from the Fiedler vector
  (mac.py:112-130, eq. 8 of arXiv:2203.13897);
- direction finding = top-k one-hot of the gradient (mac.py:132-147);
- dual upper bound u = min(u, f + grad @ (s - w)) with duality-gap early
  stop returning the *pre-step* iterate (mac.py:209-230);
- step size 2/(it+2) (mac.py:229);
- final rounding breaks ties by original edge weight (mac.py:168-189); the
  reference's decimal_tol=10 truncation is a no-op at float32 precision so
  exact-equality ties break by weight here too;
- graph disconnection surfaces as DisconnectedGraphError, standing in for
  the reference's "singular matrix" exception from TRACEMIN-LU
  (algebraic_connectivity_maximization.py:449-464 relies on it to retry).
  Because Frank-Wolfe steps w <- w + alpha*(s - w) with alpha < 1 never
  zero a positive weight, the support of L(w) only grows across
  iterations — so disconnection can only exist at the initial iterate and
  is checked exactly (union-find on the host) before launching the jitted
  solve, instead of relying on float32 eigensolver noise thresholds.

The whole Frank-Wolfe loop is one jitted XLA program with static shapes
(power-of-two padding of nodes and candidate edges). The per-iteration
Laplacian assembles as one incidence-matrix matmul; the Fiedler pair is
tracked by a warm-started LOBPCG block carried across FW iterations
(2.7x faster than per-iteration eigh on TPU), with an exact "eigh" mode
and a matrix-free "matfree" mode for graphs beyond dense (P, P) sizes.
"""

import functools
from typing import List, NamedTuple, Sequence

import numpy as np
import jax
import jax.numpy as jnp

from cslam_tpu.ops.fiedler import (fiedler_pair_inverse,
                                    fiedler_pair_lobpcg)
from cslam_tpu.ops.laplacian import (incidence_matrix, laplacian_dense,
                                     laplacian_from_incidence)
from cslam_tpu.utils.edges import Edge

# Above this node count the dense eigh Fiedler solve gives way to
# matrix-free LOBPCG over edge lists (O(E) memory instead of O(P^2)).
_LOBPCG_NODE_THRESHOLD = 2048
# Matfree swap-refinement evaluates SWAP_K^2 one-edge-swapped selections
# per round; up to this many nodes they run as ONE vmapped inverse-
# iteration program ((SWAP_K^2, P) state is a few hundred KB), beyond it
# sequentially via lax.map to bound memory.
_REFINE_VMAP_MAX_P = 65536

class DisconnectedGraphError(RuntimeError):
    """Raised when the (fixed + selected-candidate) graph is disconnected."""


class _UnionFind:
    def __init__(self, n):
        self.parent = list(range(n))

    def find(self, x):
        while self.parent[x] != x:
            self.parent[x] = self.parent[self.parent[x]]
            x = self.parent[x]
        return x

    def union(self, a, b):
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            self.parent[ra] = rb


class MACResult(NamedTuple):
    w: np.ndarray  # rounded {0,1}^m selection
    w_unrounded: np.ndarray
    upper_bound: float


def _next_pow2(n: int, minimum: int = 64) -> int:
    p = minimum
    while p < n:
        p *= 2
    return p


def _fiedler_dense(L, node_mask):
    """(lambda_2, v_2) with analytic deflation of the constant mode.

    Shifts: the constant-over-real-nodes mode moves up by c, padded nodes
    sit at `big`; both exceed lambda_2 (<= lambda_max <= 2*max_degree), so
    the smallest eigenpair of the shifted matrix is exactly (lambda_2, v_2).
    Keeping the shifts O(max_degree) (not O(trace)) preserves float32
    eigensolver accuracy on the small eigenvalues.
    """
    n_real = jnp.maximum(jnp.sum(node_mask), 1.0)
    max_deg = jnp.max(jnp.diag(L))
    c = 2.0 * max_deg + 1.0
    big = 2.0 * max_deg + 2.0
    L_shifted = (L + (c / n_real) * jnp.outer(node_mask, node_mask) +
                 jnp.diag((1.0 - node_mask) * big))
    vals, vecs = jnp.linalg.eigh(L_shifted)
    return vals[0], vecs[:, 0]


def _fiedler_dense_squaring(L, node_mask, squarings=16):
    """(lambda_2, v_2) by iterated matrix squaring — no eigh.

    Same shifted/deflated matrix as _fiedler_dense, but the smallest
    eigenpair is extracted as the DOMINANT eigenpair of
    sigma*I - L_shifted via `squarings` renormalized squarings (dense
    P x P matmuls — pure MXU work; a vmapped jnp.linalg.eigh runs at
    LAPACK-loop speed and dominated the whole MAC solve). lambda_2 is
    the Rayleigh quotient of the extracted vector on L_shifted, so the
    estimate is one-sided (>= the true lambda_2); measured worst
    relative error at float32 over MAC-shaped graphs (long chains =
    slowest spectra) is ~9e-4 at squarings>=16. Chains need the high
    count: their (lambda_3-lambda_2)/sigma is ~1e-4, so 2^16 doublings
    are what push the mixing below float32 noise."""
    n_real = jnp.maximum(jnp.sum(node_mask), 1.0)
    max_deg = jnp.max(jnp.diag(L))
    c = 2.0 * max_deg + 1.0
    big = 2.0 * max_deg + 2.0
    L_shifted = (L + (c / n_real) * jnp.outer(node_mask, node_mask) +
                 jnp.diag((1.0 - node_mask) * big))
    P = L.shape[0]
    sigma = 2.0 * max_deg + 3.0  # > lam_max(L_shifted) <= 2*max_deg + 2
    M = sigma * jnp.eye(P, dtype=L.dtype) - L_shifted
    M = M / jnp.maximum(jnp.linalg.norm(M), 1e-30)

    def body(_, Mk):
        Mk = Mk @ Mk
        return Mk / jnp.maximum(jnp.linalg.norm(Mk), 1e-30)

    M = jax.lax.fori_loop(0, squarings, body, M)
    col = jnp.argmax(jnp.sum(M * M, axis=0))
    v = M @ jax.nn.one_hot(col, P, dtype=M.dtype)
    v = v / jnp.maximum(jnp.linalg.norm(v), 1e-30)
    return v @ (L_shifted @ v), v


@functools.partial(jax.jit, static_argnames=("k", "max_iters", "num_nodes",
                                             "fiedler_method",
                                             "lobpcg_iters", "lobpcg_block",
                                             "refine_rounds", "swap_k"))
def _fw_subset(L_fixed, e_i, e_j, weights, valid, node_mask, w_init,
               duality_gap_tol, fixed_e_i=None, fixed_e_j=None,
               fixed_w=None, *, k, max_iters, num_nodes,
               fiedler_method="eigh", lobpcg_iters=16, lobpcg_block=4,
               refine_rounds=0, swap_k=4):
    """Jitted Frank-Wolfe subset selection. Returns
    (w_rounded, w_unrounded, upper_bound).

    fiedler_method:
      "eigh"        — dense deflated eigh per iteration (exact);
      "warm-lobpcg" — dense Laplacian but the Fiedler pair tracked by a
        warm-started LOBPCG block carried across FW iterations: w changes
        little per step, so eigenvector continuity lets a handful of
        matmuls replace the full eigendecomposition (the in-loop eigh
        dominates MAC wall time on TPU);
      "matfree"     — matrix-free LOBPCG over edge lists for graphs too
        large for any dense (P, P) matrix (SURVEY §7 hard part 1)."""

    if fiedler_method == "matfree":
        all_i = jnp.concatenate([fixed_e_i, e_i])
        all_j = jnp.concatenate([fixed_e_j, e_j])

        # Map-scale Fiedler pairs come from INVERSE iteration with a
        # chain-exact (cyclic-reduction) preconditioner — NOT LOBPCG on
        # the flipped operator, which is numerically blind at this
        # scale: lambda_2 ~ pi^2/P^2 drops below f32 resolution of
        # sigma at P >= ~2048 (measured 3000x error at P=4096, round
        # 4; see ops/fiedler.fiedler_pair_inverse). The eigenvector is
        # CARRIED across FW iterations: w moves O(1/it) per step, so
        # the previous vector is near-converged and few inverse
        # iterations suffice.
        def fiedler_at(w, v):
            all_w = jnp.concatenate([fixed_w, w * weights])
            lam2, v = fiedler_pair_inverse(
                all_i, all_j, all_w, node_mask, v0=v,
                invit_iters=6, cg_iters=16)
            return lam2, v, v
        fiedler_carry0 = jax.random.normal(
            jax.random.PRNGKey(3), (node_mask.shape[0],),
            dtype=jnp.float32)
    else:
        # loop-invariant incidence matrix: per-iteration Laplacian
        # assembly becomes one MXU matmul
        B = incidence_matrix(e_i, e_j, num_nodes)
        n_real = jnp.maximum(jnp.sum(node_mask), 1.0)

        def shifted(w):
            L = L_fixed + laplacian_from_incidence(B, w * weights)
            max_deg = jnp.max(jnp.diag(L))
            c = 2.0 * max_deg + 1.0
            big = 2.0 * max_deg + 2.0
            L_s = (L + (c / n_real) * jnp.outer(node_mask, node_mask) +
                   jnp.diag((1.0 - node_mask) * big))
            return L_s, 2.0 * max_deg + 3.0  # sigma > lam_max(L_s)? below

        if fiedler_method == "warm-lobpcg":
            def fiedler_at(w, X):
                from jax.experimental.sparse.linalg import lobpcg_standard
                L_s, _ = shifted(w)
                # largest eigenpairs of sigma*I - L_s == smallest of L_s
                sigma = 2.0 * jnp.max(jnp.diag(L_s)) + 1.0
                theta, U, _ = lobpcg_standard(
                    lambda Y: sigma * Y - L_s @ Y, X, m=lobpcg_iters)
                lam2 = sigma - theta[0]
                # refresh the carried block with the converged vectors
                return lam2, U[:, 0], U
            key = jax.random.PRNGKey(3)
            fiedler_carry0 = jax.random.normal(
                key, (num_nodes, lobpcg_block), dtype=jnp.float32)
        else:
            def fiedler_at(w, carry):
                L_s, _ = shifted(w)
                vals, vecs = jnp.linalg.eigh(L_s)
                return vals[0], vecs[:, 0], carry
            fiedler_carry0 = jnp.zeros((1,), dtype=jnp.float32)

    def round_topk(key_vec):
        _, idx = jax.lax.top_k(jnp.where(valid, key_vec, -jnp.inf), k)
        return jnp.zeros_like(key_vec).at[idx].set(1.0)

    def cond(state):
        it, _, _, done, _ = state
        return (it < max_iters) & (~done)

    def body(state):
        it, w, u, _, carry = state
        lam2, v, carry = fiedler_at(w, carry)
        grad = weights * jnp.square(v[e_i] - v[e_j]) * valid
        s = round_topk(grad)
        u_new = jnp.minimum(u, lam2 + jnp.dot(grad, s - w))
        done = (u_new - lam2) < duality_gap_tol
        alpha = 2.0 / (it.astype(jnp.float32) + 2.0)
        w_next = jnp.where(done, w, w + alpha * (s - w))
        return it + 1, w_next, u_new, done, carry

    init = (jnp.int32(0), w_init.astype(jnp.float32), jnp.float32(jnp.inf),
            jnp.bool_(False), fiedler_carry0)
    _, w, u, _, _ = jax.lax.while_loop(cond, body, init)

    # Tie-break rounding: primary key w, secondary key original weight
    # (mac.py round_solution_tiebreaker). lexsort's last key is primary.
    primary = jnp.where(valid, w, -1.0)
    order = jnp.lexsort((weights, primary))
    top = order[-k:] if k > 0 else order[:0]
    w_rounded = jnp.zeros_like(w).at[top].set(1.0) if k > 0 else jnp.zeros_like(w)

    # Rounding safeguard: FW with inexact (warm-lobpcg) gradients can
    # land on a selection whose true lambda_2 is up to ~3-6x below the
    # exact-gradient run's on clustered spectra (long chains: measured
    # rel 0.15-0.38 on some inits). Evaluate the FW rounding AND the
    # greedy-by-weight rounding and return the better. The evaluation is
    # the matrix-squaring Fiedler pair, NOT eigh: a vmapped (2, P, P)
    # eigh was ~18 ms of a 28 ms solve at P=512 (the batched-LAPACK
    # pathology), the squaring evaluation is plain MXU matmuls. Its
    # estimates carry <=~1e-3 one-sided relative error, so FW must beat
    # greedy by a 3e-3 margin to be picked — near-ties fall back to
    # greedy, preserving the never-worse-than-greedy contract (greedy
    # top-k is the reference's own initialization, a_c_m.py zero-budget
    # greedy).
    if fiedler_method != "matfree" and k > 0:
        w_greedy = round_topk(weights)

        def rounding_lam2(sel):
            L = L_fixed + laplacian_from_incidence(B, sel * weights)
            lam2, _ = _fiedler_dense_squaring(L, node_mask)
            return lam2

        lam2s = jax.vmap(rounding_lam2)(jnp.stack([w_rounded, w_greedy]))
        w_rounded = jnp.where(lam2s[0] > lam2s[1] * 1.003, w_rounded,
                              w_greedy)

    # Local-swap refinement: rounding a relaxed FW point is noisy — on
    # small instances the rounded lambda_2 varies 0.6-2x run-to-run at
    # identical unrounded quality (measured vs the reference's own
    # rounding, round 4). One-swap exchange fixes most of it: per
    # round, shortlist the _SWAP_K lowest-supergradient selected edges
    # x the _SWAP_K highest unselected ones and evaluate all swaps AT
    # ONCE — a vmapped matrix-squaring Fiedler batch, pure MXU matmuls
    # (a batched eigh here would re-introduce the LAPACK pathology).
    # The squaring estimate is one-sided with <=~1e-3 relative error,
    # so a swap must win by 0.5% to be taken: every accepted swap is a
    # TRUE improvement, preserving the >=greedy contract.
    if fiedler_method != "matfree" and k > 0 and refine_rounds > 0:
        SWAP_K = swap_k
        n_valid = jnp.sum(valid)
        can_swap = (n_valid > k) & (jnp.float32(k) >= 1.0)

        def refine(sel, _):
            L = L_fixed + laplacian_from_incidence(B, sel * weights)
            lam2_cur, v = _fiedler_dense_squaring(L, node_mask)
            grad = weights * jnp.square(v[e_i] - v[e_j]) * valid
            add_score = jnp.where((sel < 0.5) & (valid > 0), grad, -jnp.inf)
            add_s, add_idx = jax.lax.top_k(add_score, SWAP_K)
            rem_score = jnp.where(sel > 0.5, -grad, -jnp.inf)
            rem_s, rem_idx = jax.lax.top_k(rem_score, SWAP_K)
            aa, rr = jnp.meshgrid(jnp.arange(SWAP_K), jnp.arange(SWAP_K),
                                  indexing="ij")
            aa, rr = aa.ravel(), rr.ravel()
            swap_ok = jnp.isfinite(add_s)[aa] & jnp.isfinite(rem_s)[rr]

            def make_sel(a, r):
                return sel.at[rem_idx[r]].set(0.0).at[add_idx[a]].set(1.0)

            sels = jax.vmap(make_sel)(aa, rr)
            lam2s = jax.vmap(rounding_lam2)(sels)
            lam2s = jnp.where(swap_ok & can_swap, lam2s, -jnp.inf)
            best = jnp.argmax(lam2s)
            take = lam2s[best] > lam2_cur * 1.005
            sel = jnp.where(take, sels[best], sel)
            return sel, None

        w_rounded, _ = jax.lax.scan(refine, w_rounded, None,
                                    length=refine_rounds)

    # Matfree flavor of the same refinement: swaps are evaluated by
    # inverse iteration warm-started from the CURRENT selection's
    # converged Fiedler vector (one-edge perturbation => strong
    # eigenvector continuity). Evaluations run as one vmapped batch up
    # to _REFINE_VMAP_MAX_P nodes (sequentially beyond, to bound
    # memory). The inverse-iteration estimates
    # are Rayleigh quotients of approximate vectors: one-sided
    # overestimates with measured rel error <= ~4e-4 at P up to 8192
    # (ops/fiedler.py) — the 1% accept margins below guarantee every
    # accepted change is a TRUE improvement.
    if fiedler_method == "matfree" and k > 0 and refine_rounds > 0:
        SWAP_K = swap_k
        n_valid = jnp.sum(valid)
        can_swap = n_valid > k

        def eval_sel(sel, v0, invit, cg):
            all_w = jnp.concatenate([fixed_w, sel * weights])
            return fiedler_pair_inverse(all_i, all_j, all_w, node_mask,
                                        v0=v0, invit_iters=invit,
                                        cg_iters=cg)

        v_carry = jax.random.normal(jax.random.PRNGKey(11),
                                    (node_mask.shape[0],), jnp.float32)

        # >=greedy safeguard, matfree flavor (the dense path's
        # FW-vs-greedy comparison above is gated off here).
        w_greedy = round_topk(weights)
        lam_fw, v_carry = eval_sel(w_rounded, v_carry, 12, 24)
        lam_gr, _ = eval_sel(w_greedy, v_carry, 12, 24)
        w_rounded = jnp.where(lam_fw > lam_gr * 1.01, w_rounded, w_greedy)

        def refine_mf(carry, _):
            sel, v = carry
            lam2_cur, v = eval_sel(sel, v, 8, 20)
            grad = weights * jnp.square(v[e_i] - v[e_j]) * valid
            add_score = jnp.where((sel < 0.5) & (valid > 0), grad,
                                  -jnp.inf)
            add_s, add_idx = jax.lax.top_k(add_score, SWAP_K)
            rem_score = jnp.where(sel > 0.5, -grad, -jnp.inf)
            rem_s, rem_idx = jax.lax.top_k(rem_score, SWAP_K)
            aa, rr = jnp.meshgrid(jnp.arange(SWAP_K), jnp.arange(SWAP_K),
                                  indexing="ij")
            aa, rr = aa.ravel(), rr.ravel()
            swap_ok = jnp.isfinite(add_s)[aa] & jnp.isfinite(rem_s)[rr]

            def swap_lam2(ar):
                a, r = ar
                s2 = sel.at[rem_idx[r]].set(0.0).at[add_idx[a]].set(1.0)
                lam2, _ = eval_sel(s2, v, 8, 20)
                return lam2

            if node_mask.shape[0] <= _REFINE_VMAP_MAX_P:
                # One BATCHED inverse-iteration program for all swap
                # candidates: the sequential lax.map burned
                # SWAP_K^2 x invit x cg serial CG trips of op-floor-
                # sized (P,) arithmetic per refine round — ~80% of the
                # whole map-scale solve's device time (round 4). A
                # (SWAP_K^2, P) batch is only ~SWAP_K^2 * 4P bytes of
                # state, far below any memory concern at these P.
                lam2s = jax.vmap(swap_lam2)((aa, rr))
            else:
                lam2s = jax.lax.map(swap_lam2, (aa, rr))
            lam2s = jnp.where(swap_ok & can_swap, lam2s, -jnp.inf)
            best = jnp.argmax(lam2s)
            take = lam2s[best] > lam2_cur * 1.01
            s_best = sel.at[rem_idx[best % SWAP_K]].set(0.0) \
                        .at[add_idx[best // SWAP_K]].set(1.0)
            sel = jnp.where(take, s_best, sel)
            return (sel, v), None

        (w_rounded, _), _ = jax.lax.scan(refine_mf, (w_rounded, v_carry),
                                         None, length=refine_rounds)
    return w_rounded, w, u


class MAC:
    """Host wrapper: builds padded arrays once, runs the jitted FW solve.

    Interface parity with the reference MAC class (mac.py:19-233):
    __init__(fixed_measurements, candidate_measurements, num_poses) and
    fw_subset(w_init, k, max_iters, duality_gap_tol).
    """

    def __init__(self, fixed_measurements: Sequence[Edge],
                 candidate_measurements: Sequence[Edge], num_poses: int):
        self.num_poses = int(num_poses)
        self._P = _next_pow2(max(self.num_poses, 2))
        m = len(candidate_measurements)
        self._E = _next_pow2(max(m, 1), minimum=8)
        self.m = m

        # fixed edges are PADDED to power-of-two buckets like everything
        # else: an exact-length array here re-traced and re-compiled the
        # whole _fw_subset program on EVERY detection tick as odometry
        # edges accumulated (measured 5.3 s/solve of pure trace+compile
        # on a mission broker vs ~60 ms of actual solve, round 4).
        # Zero-weight (0, 0) padding contributes nothing to any
        # Laplacian form used downstream.
        F = _next_pow2(max(len(fixed_measurements), 1))
        fi = np.zeros(F, dtype=np.int32)
        fj = np.zeros(F, dtype=np.int32)
        fw = np.zeros(F, dtype=np.float32)
        for idx, e in enumerate(fixed_measurements):
            fi[idx], fj[idx], fw[idx] = e.i, e.j, e.weight
        self._fixed_i = jnp.asarray(fi)
        self._fixed_j = jnp.asarray(fj)
        self._fixed_w = jnp.asarray(fw)
        # warm-lobpcg: the FW loop's Fiedler pair tracked by a carried
        # LOBPCG block — 2.7x faster than per-iteration eigh on TPU at
        # equal selection quality (see test_mac_large consistency check);
        # "eigh" remains available for exact solves.
        self.fiedler_method = "matfree" if self._P > _LOBPCG_NODE_THRESHOLD \
            else "warm-lobpcg"
        # warm-lobpcg budget: iterations per FW step / carried block
        # width. Defaults set by the clustered-spectrum sweep in
        # test_mac_large (long chains: lambda_2..lambda_5 within ~2x).
        self.lobpcg_iters = 16
        self.lobpcg_block = 4
        # Local-swap refinement rounds after rounding (see _fw_subset):
        # each round evaluates swap_k^2 one-swap exchanges — a vmapped
        # matrix-squaring batch on the dense path, warm-started inverse
        # iteration on the matfree path. Parity-harness quality:
        # swap_k 4 -> median 1.56x / min 1.03x the reference's rounded
        # lambda_2; 2 -> 1.42x / 1.00x; 1 dips to 0.96x on one seed.
        # At mission bucket sizes (P <= 512) a round is ~1.5 ms on MXU
        # and ~10 ms on a CPU host — the knob exists for hosts that
        # need detection ticks leaner still.
        self.refine_rounds = self._default_refine_rounds()
        self.swap_k = 4
        # Matfree FW iteration cap (see fw_subset): deeper FW measured
        # WORSE post-refinement at map scale.
        self.fw_matfree_iters = 8
        if self.fiedler_method == "matfree":
            # dense (P, P) Laplacians are off the table at this size
            self.L_fixed = jnp.zeros((1, 1), dtype=jnp.float32)
        else:
            self.L_fixed = laplacian_dense(self._fixed_i, self._fixed_j,
                                           self._fixed_w, self._P)

        self.e_i = np.zeros(self._E, dtype=np.int32)
        self.e_j = np.zeros(self._E, dtype=np.int32)
        self.weights = np.zeros(self._E, dtype=np.float32)
        self.valid = np.zeros(self._E, dtype=np.float32)
        for idx, e in enumerate(candidate_measurements):
            self.e_i[idx], self.e_j[idx] = e.i, e.j
            self.weights[idx] = e.weight
            self.valid[idx] = 1.0

        mask = np.zeros(self._P, dtype=np.float32)
        mask[:self.num_poses] = 1.0
        self.node_mask = jnp.asarray(mask)
        # device-resident copies of the per-call-constant arrays: over a
        # remote-relay backend each per-call jnp.asarray upload is a
        # host<->device roundtrip that dwarfs the solve itself
        self._e_i_d = jnp.asarray(self.e_i)
        self._e_j_d = jnp.asarray(self.e_j)
        self._weights_d = jnp.asarray(self.weights)
        self._valid_d = jnp.asarray(self.valid)

        self._fixed_pairs = [(int(e.i), int(e.j)) for e in fixed_measurements]
        self._cand_pairs = [(int(e.i), int(e.j))
                            for e in candidate_measurements]

    def _default_refine_rounds(self) -> int:
        if self.fiedler_method == "matfree":
            return 4
        return 2 if self._P <= 512 else 1

    # back-compat alias used by tests and older callers
    @property
    def use_lobpcg(self):
        return self.fiedler_method == "matfree"

    @use_lobpcg.setter
    def use_lobpcg(self, value):
        self.fiedler_method = "matfree" if value else "eigh"
        self.refine_rounds = self._default_refine_rounds()

    def _check_connected(self, w, tol=1e-10):
        """Exact connectivity of fixed edges + candidates with w > tol.

        Raises DisconnectedGraphError (the reference's TRACEMIN
        singular-matrix condition, mac.py:35-59) when any of the
        num_poses nodes is unreachable."""
        if self.num_poses <= 1:
            return
        uf = _UnionFind(self.num_poses)
        for i, j in self._fixed_pairs:
            uf.union(i, j)
        for (i, j), wi in zip(self._cand_pairs, np.asarray(w)):
            if wi > tol:
                uf.union(i, j)
        root = uf.find(0)
        for node in range(1, self.num_poses):
            if uf.find(node) != root:
                raise DisconnectedGraphError(
                    f"node {node} unreachable in the selected graph")

    def _pad_w(self, w):
        out = np.zeros(self._E, dtype=np.float32)
        out[:len(w)] = np.asarray(w, dtype=np.float32)
        return jnp.asarray(out)

    def evaluate_objective(self, w) -> float:
        """lambda_2(L(w)) — used by tests and greedy-vs-MAC comparisons."""
        L = self.L_fixed + laplacian_dense(
            jnp.asarray(self.e_i), jnp.asarray(self.e_j),
            self._pad_w(w) * jnp.asarray(self.weights), self._P)
        self._check_connected(w)
        lam2, _ = _fiedler_dense(L, self.node_mask)
        return float(lam2)

    def fw_subset(self, w_init, k: int, max_iters=None,
                  duality_gap_tol: float = 1e-8) -> MACResult:
        """Frank-Wolfe subset selection. Defaults match the reference:
        max_iters=20 (cslam/mac/mac.py:191, a_c_m.py:39), tol 1e-8.

        max_iters=None (the default) lets the map-scale matfree path
        substitute its measured-better fw_matfree_iters budget; an
        EXPLICIT max_iters is always honored verbatim (the reference
        MAC contract: the caller owns the budget)."""
        k = int(min(k, self.m))
        if self.m == 0 or k <= 0:
            return MACResult(np.zeros(self.m, np.float32),
                             np.zeros(self.m, np.float32), float("inf"))
        # Matfree default FW budget is fw_matfree_iters: past ~8
        # iterations the 2/(it+2) steps spread w fractionally over MORE
        # candidates and the top-k rounding gets WORSE — measured over
        # 10 seeds at P=4096/8192 (round 4): post-refinement
        # lambda2/greedy mean 2.99 at 8 iters vs 2.44 at 20, never
        # below 2.46g vs a 1.00g worst case at 20. The swap refinement
        # (not FW depth) carries selection quality on this path, and
        # each saved iteration is a full inverse-iteration Fiedler
        # solve of serial device time. Applies only when the caller
        # left max_iters at the default AND at map scale (matfree-by-
        # default sizes): on small graphs where matfree is merely
        # forced for testing, deeper FW still helps.
        if max_iters is None:
            max_iters = 20
            if (self.fiedler_method == "matfree"
                    and self._P > _LOBPCG_NODE_THRESHOLD):
                max_iters = min(max_iters, self.fw_matfree_iters)
        # FW support only grows, so connectivity at the initial iterate
        # implies connectivity at every iterate (see module docstring).
        self._check_connected(w_init)
        w_rounded, w, u = _fw_subset(
            self.L_fixed, self._e_i_d, self._e_j_d,
            self._weights_d, self._valid_d,
            self.node_mask, self._pad_w(w_init),
            jnp.float32(duality_gap_tol),
            self._fixed_i, self._fixed_j, self._fixed_w,
            k=k, max_iters=max_iters, num_nodes=self._P,
            fiedler_method=self.fiedler_method,
            lobpcg_iters=self.lobpcg_iters, lobpcg_block=self.lobpcg_block,
            refine_rounds=self.refine_rounds, swap_k=self.swap_k)
        # ONE batched device_get: three separate np.asarray/float pulls
        # are three relay roundtrips (~30 ms each measured)
        w_rounded, w, u = jax.device_get((w_rounded, w, u))
        return MACResult(w_rounded[:self.m], w[:self.m], float(u))


def select_measurements(measurements: Sequence, w) -> List:
    """Subset of measurements where the rounded selection is 1
    (mac/utils.py:144-154)."""
    assert len(measurements) == len(w)
    return [m for m, wi in zip(measurements, w) if wi == 1.0]
