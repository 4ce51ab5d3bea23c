"""On-device LBVH builder (SURVEY.md §2.2 G6/G7, §3.3 right column).

Replaces the reference's driver-internal BLAS/TLAS build
(``vkCmdBuildAccelerationStructuresKHR``, SURVEY.md C8 [VK-API]) with a
fully jittable construction over arbitrary primitives:

  1. Morton codes of primitive centroids, 30-bit (G6); ties broken by
     primitive index so radix-tree keys are unique.
  2. Stable argsort by code (G6; ``jnp.argsort`` → XLA sort — hand-rolled
     Pallas radix sort only if profiling demands, SURVEY.md §7).
  3. Karras-2012-style parallel binary radix-tree emit (G7): every internal
     node finds its range/split with vectorized masked binary searches —
     no sequential recursion, ideal for the VPU.
  4. Bottom-up AABB refit + subtree sizes as an atomics-free fixpoint
     (each pass propagates one tree level; converges in depth passes —
     the TPU answer to the reference driver's atomic refit, SURVEY.md §5
     "race detection": there is nothing to race).
  5. Leaf collapse to ``leaf_size`` (Karras nodes cover contiguous sorted
     ranges, so collapsed leaves are (start, count) slices).
  6. Depth-first (preorder) reorder, which makes stackless traversal
     implicit: the hit-successor of node n is n+1 and the miss/after
     successor is skip[n] = preorder_rank[n] + active_subtree_size[n]
     (stackless skip links, cf. arxiv 2402.00665 [P]).

Everything is static-shaped: node arrays are allocated at 2T slots and the
live prefix length ``n_active`` is a device scalar (XLA-friendly — no
dynamic shapes, SURVEY.md §7 "hard parts").
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class Bvh(NamedTuple):
    """A flattened BVH in depth-first order (pytree of device arrays).

    Arrays have 2T slots (T = #primitives); only slots [0, n_active) are
    live. ``count`` semantics: 0 = internal node (hit successor = n+1),
    >0 = leaf covering ``count`` sorted primitives starting at ``first``.
    ``skip[n]`` = node to visit on AABB miss / after a leaf; the root's
    subtree ends at n_active, so "node >= n_active" means traversal done.
    ``perm[s]`` maps sorted slot s → original primitive index.
    """

    bmin: jnp.ndarray  # (2T, 3) f32
    bmax: jnp.ndarray  # (2T, 3) f32
    first: jnp.ndarray  # (2T,) i32
    count: jnp.ndarray  # (2T,) i32
    skip: jnp.ndarray  # (2T,) i32
    n_active: jnp.ndarray  # () i32
    perm: jnp.ndarray  # (T,) i32

    @property
    def capacity(self) -> int:
        return self.bmin.shape[0]

    @property
    def num_prims(self) -> int:
        return self.perm.shape[0]


def _expand_bits10(v: jnp.ndarray) -> jnp.ndarray:
    """Spread the low 10 bits of v so there are 2 zero bits between each."""
    v = v.astype(jnp.uint32)
    v = (v | (v << 16)) & jnp.uint32(0x030000FF)
    v = (v | (v << 8)) & jnp.uint32(0x0300F00F)
    v = (v | (v << 4)) & jnp.uint32(0x030C30C3)
    v = (v | (v << 2)) & jnp.uint32(0x09249249)
    return v


def morton_codes(centroids: jnp.ndarray, scene_min: jnp.ndarray,
                 scene_max: jnp.ndarray) -> jnp.ndarray:
    """30-bit Morton codes of points normalized to the scene AABB (G6)."""
    extent = jnp.maximum(scene_max - scene_min, 1e-12)
    q = jnp.clip((centroids - scene_min) / extent, 0.0, 1.0)
    grid = jnp.minimum((q * 1024.0).astype(jnp.uint32), jnp.uint32(1023))
    x = _expand_bits10(grid[:, 0])
    y = _expand_bits10(grid[:, 1])
    z = _expand_bits10(grid[:, 2])
    return ((x << 2) | (y << 1) | z).astype(jnp.uint32)


def _clz32(x: jnp.ndarray) -> jnp.ndarray:
    return jax.lax.clz(x.astype(jnp.uint32)).astype(jnp.int32)


def _make_delta(codes: jnp.ndarray):
    """Karras delta(i, j): common-prefix length of keys i and j; -1 when j
    is out of range. Equal Morton codes fall back to index bits (+32), so
    keys are effectively unique (required for a well-formed radix tree)."""
    t = codes.shape[0]

    def delta(i, j):
        valid = (j >= 0) & (j < t)
        jc = jnp.clip(j, 0, t - 1)
        ci = codes[i]
        cj = codes[jc]
        x = ci ^ cj
        idx_xor = (i ^ jc).astype(jnp.uint32)
        d = jnp.where(x == 0, 32 + _clz32(idx_xor), _clz32(x))
        return jnp.where(valid, d, -1)

    return delta


def _karras_topology(codes_sorted: jnp.ndarray):
    """Vectorized Karras-2012 radix-tree emit (G7): for every internal node
    i ∈ [0, T-2], find its covered range and split point with masked
    doubling + binary searches (fixed 32-step loops — static control flow).

    Returns (left, right, parent): children ids where id < T-1 is an
    internal node and id >= T-1 is leaf (id - (T-1)) over sorted slots.
    """
    t = codes_sorted.shape[0]
    n_internal = t - 1
    delta = _make_delta(codes_sorted)
    i = jnp.arange(n_internal, dtype=jnp.int32)

    d = jnp.where(delta(i, i + 1) > delta(i, i - 1), 1, -1).astype(jnp.int32)
    delta_min = delta(i, i - d)

    # exponential search for the range length upper bound
    def grow(_, carry):
        l_max, done = carry
        cond = (~done) & (delta(i, i + l_max * d) > delta_min)
        l_max = jnp.where(cond, l_max * 2, l_max)
        return l_max, done | ~cond

    l_max, _ = jax.lax.fori_loop(
        0, 32, grow, (jnp.full_like(i, 2), jnp.zeros_like(i, bool))
    )

    # binary search for the exact range length l
    def shrink(_, carry):
        l, step = carry
        take = (step > 0) & (delta(i, i + (l + step) * d) > delta_min)
        l = jnp.where(take, l + step, l)
        return l, step // 2

    l, _ = jax.lax.fori_loop(
        0, 32, shrink, (jnp.zeros_like(i), l_max // 2)
    )
    j = i + l * d
    delta_node = delta(i, j)

    # binary search for the split position s (t = ceil(l/2), ceil(t/2), …, 1;
    # each step width is used exactly once — the done flag stops width 1 from
    # being re-applied on later iterations)
    def split_body(_, carry):
        s, step, done = carry
        take = (
            (~done)
            & (delta(i, i + (s + step) * d) > delta_node)
            & (s + step < l)
        )
        s = jnp.where(take, s + step, s)
        done = done | (step <= 1)
        step = jnp.maximum((step + 1) // 2, 1)
        return s, step, done

    s, _, _ = jax.lax.fori_loop(
        0,
        33,
        split_body,
        (jnp.zeros_like(i), (l + 1) // 2, l <= 1),
    )
    gamma = i + s * d + jnp.minimum(d, 0)

    lo = jnp.minimum(i, j)
    hi = jnp.maximum(i, j)
    leaf_base = n_internal  # leaf k has node id (T-1) + k
    left = jnp.where(lo == gamma, leaf_base + gamma, gamma)
    right = jnp.where(hi == gamma + 1, leaf_base + gamma + 1, gamma + 1)

    parent = jnp.full(2 * t - 1, -1, jnp.int32)
    parent = parent.at[left].set(i)
    parent = parent.at[right].set(i)
    return left.astype(jnp.int32), right.astype(jnp.int32), parent


def _fixpoint(step_fn, state, max_iters: int):
    """Iterate ``step_fn`` until the pytree state stops changing (bounded by
    max_iters). Each pass propagates one tree level; BVH depth with unique
    64-bit-equivalent keys is <= 64, so max_iters = 72 is always enough."""

    def cond(carry):
        it, _, done = carry
        return (~done) & (it < max_iters)

    def body(carry):
        it, x, _ = carry
        x_new = step_fn(x)
        same = jax.tree.reduce(
            lambda a, b: a & b,
            jax.tree.map(lambda u, v: jnp.array_equal(u, v), x, x_new),
        )
        return it + 1, x_new, same

    _, final, _ = jax.lax.while_loop(
        cond, body, (jnp.int32(0), state, jnp.array(False))
    )
    return final


def build_lbvh(prim_bmin: jnp.ndarray, prim_bmax: jnp.ndarray,
               leaf_size: int = 4) -> Bvh:
    """Build an LBVH over primitives given their AABBs. Fully jittable.

    ``leaf_size`` > 1 collapses small subtrees into contiguous-range leaves
    (valid because every Karras node covers a contiguous sorted range).
    """
    t = prim_bmin.shape[0]
    prim_bmin = prim_bmin.astype(jnp.float32)
    prim_bmax = prim_bmax.astype(jnp.float32)

    if t == 1:
        return Bvh(
            bmin=jnp.concatenate([prim_bmin, prim_bmin]),
            bmax=jnp.concatenate([prim_bmax, prim_bmax]),
            first=jnp.zeros(2, jnp.int32),
            count=jnp.array([1, 0], jnp.int32),
            skip=jnp.array([1, 1], jnp.int32),
            n_active=jnp.asarray(1, jnp.int32),
            perm=jnp.zeros(1, jnp.int32),
        )

    centroids = 0.5 * (prim_bmin + prim_bmax)
    scene_min = jnp.min(prim_bmin, axis=0)
    scene_max = jnp.max(prim_bmax, axis=0)
    codes = morton_codes(centroids, scene_min, scene_max)
    perm = jnp.argsort(codes, stable=True).astype(jnp.int32)  # G6 sort
    codes_sorted = codes[perm]

    left, right, parent = _karras_topology(codes_sorted)

    n_internal = t - 1
    n_nodes = 2 * t - 1
    is_internal = jnp.arange(n_nodes) < n_internal
    slot_of = jnp.arange(n_nodes, dtype=jnp.int32) - n_internal  # leaf slots

    # --- bottom-up: AABBs (refit), subtree prim counts, range starts (G7)
    leaf_bmin = prim_bmin[perm]
    leaf_bmax = prim_bmax[perm]
    big = jnp.float32(3.4e38)

    def up_step(st):
        bmin, bmax, size, start = st
        l_gather = lambda a: a[left]
        r_gather = lambda a: a[right]
        nbmin = jnp.minimum(l_gather(bmin), r_gather(bmin))
        nbmax = jnp.maximum(l_gather(bmax), r_gather(bmax))
        nsize = l_gather(size) + r_gather(size)
        nstart = jnp.minimum(l_gather(start), r_gather(start))
        upd = lambda full, internal_vals: jnp.concatenate(
            [internal_vals, full[n_internal:]], axis=0
        )
        return (upd(bmin, nbmin), upd(bmax, nbmax), upd(size, nsize),
                upd(start, nstart))

    bmin0 = jnp.concatenate([jnp.full((n_internal, 3), big), leaf_bmin])
    bmax0 = jnp.concatenate([jnp.full((n_internal, 3), -big), leaf_bmax])
    size0 = jnp.concatenate(
        [jnp.zeros(n_internal, jnp.int32), jnp.ones(t, jnp.int32)]
    )
    start0 = jnp.concatenate(
        [jnp.full(n_internal, t, jnp.int32), jnp.arange(t, dtype=jnp.int32)]
    )
    bmin, bmax, size, start = _fixpoint(
        up_step, (bmin0, bmax0, size0, start0), 72
    )

    # --- leaf collapse: internal nodes with size <= leaf_size whose parent
    # is bigger become leaves over [start, start+size).
    parent_size = jnp.where(parent >= 0, size[jnp.maximum(parent, 0)], t + 1)
    collapsed = is_internal & (size <= leaf_size) & (parent_size > leaf_size)

    # --- top-down: "under a collapsed ancestor" mask
    def under_step(under):
        pu = jnp.where(parent >= 0,
                       under[jnp.maximum(parent, 0)]
                       | collapsed[jnp.maximum(parent, 0)],
                       False)
        return pu

    under = _fixpoint(under_step, jnp.zeros(n_nodes, bool), 72)

    active_leaf = (~under) & (collapsed | (~is_internal & ~collapsed))
    active_internal = (~under) & is_internal & (~collapsed)
    active = active_leaf | active_internal

    # --- bottom-up: active subtree node counts
    def asize_step(a):
        child_sum = a[left] + a[right]
        internal_vals = jnp.where(
            active_internal[:n_internal], 1 + child_sum,
            jnp.where(active_leaf[:n_internal], 1, 0),
        )
        return jnp.concatenate(
            [internal_vals, jnp.where(active_leaf[n_internal:], 1, 0)]
        ).astype(jnp.int32)

    asize = _fixpoint(asize_step, jnp.zeros(n_nodes, jnp.int32), 72)
    n_active = asize[0]

    # --- top-down: preorder rank (children of active internal nodes)
    def rank_step(rank):
        p = jnp.maximum(parent, 0)
        has_p = parent >= 0
        i_am_left = left[p] == jnp.arange(n_nodes)
        from_parent = jnp.where(
            i_am_left,
            rank[p] + 1,
            rank[p] + 1 + asize[left[p]],
        )
        new = jnp.where(has_p & active & active_internal[p], from_parent,
                        rank)
        return new.at[0].set(0).astype(jnp.int32)

    rank = _fixpoint(rank_step, jnp.zeros(n_nodes, jnp.int32), 72)

    # --- scatter into depth-first output arrays (2T slots; slot 2T-1 is the
    # dump for inactive nodes — never read because rank < n_active <= 2T-1).
    cap = 2 * t
    out_idx = jnp.where(active, rank, cap - 1).astype(jnp.int32)
    o_bmin = jnp.zeros((cap, 3), jnp.float32).at[out_idx].set(bmin)
    o_bmax = jnp.zeros((cap, 3), jnp.float32).at[out_idx].set(bmax)
    leaf_first = jnp.where(is_internal, start, slot_of)
    leaf_count = jnp.where(is_internal, size, 1)
    first_vals = jnp.where(active_leaf, leaf_first, 0)
    count_vals = jnp.where(active_leaf, leaf_count, 0)
    o_first = jnp.zeros(cap, jnp.int32).at[out_idx].set(first_vals)
    o_count = jnp.zeros(cap, jnp.int32).at[out_idx].set(count_vals)
    o_skip = jnp.zeros(cap, jnp.int32).at[out_idx].set(rank + asize)

    return Bvh(
        bmin=o_bmin,
        bmax=o_bmax,
        first=o_first,
        count=o_count,
        skip=o_skip,
        n_active=n_active.astype(jnp.int32),
        perm=perm,
    )


def tri_aabbs(v0: jnp.ndarray, v1: jnp.ndarray, v2: jnp.ndarray):
    """Per-triangle AABBs (the BLAS geometry descriptor analog)."""
    bmin = jnp.minimum(jnp.minimum(v0, v1), v2)
    bmax = jnp.maximum(jnp.maximum(v0, v1), v2)
    return bmin, bmax
