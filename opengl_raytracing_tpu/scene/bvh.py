"""Median-split BVH builder producing a preorder skip-link layout.

Algorithm parity with the reference's CPU builder
(reference: src/scene/bvh.cpp:41-137): recursive median split on the
longest AABB axis by centroid (nth_element semantics), leaf_max=8, and a
post-build remap that packs each leaf's triangles contiguously.

TPU-native re-design of the *layout*: instead of the reference's TBO
packing with child pointers + a 64-deep traversal stack
(reference: src/scene/bvh.cpp:147-217, shaders/rt/rt_bvh.glsl:193-243),
nodes are emitted in DFS preorder and each node stores a **skip link**
(the preorder index that follows its whole subtree).  Traversal then needs
no stack at all:

    next = hit_and_inner ? i + 1 : skip[i]

which reduces per-ray traversal state to ONE int32 — the property that
makes both the vectorized jnp traversal and the Pallas packet kernel
(a single shared scalar cursor per ray tile) possible.

A C++ implementation of the same builder lives in `native/`; this numpy
version is the oracle and fallback.  Both produce identical layouts.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import numpy as np

LEAF_MAX = 8


@dataclasses.dataclass
class BVH:
    """Host-side BVH: structured arrays in preorder."""
    bmin: np.ndarray    # [N,3] f32
    bmax: np.ndarray    # [N,3] f32
    left: np.ndarray    # [N] i32 (-1 for leaf)
    right: np.ndarray   # [N] i32 (-1 for leaf)
    first: np.ndarray   # [N] i32 (leaf: base into remapped tris, else -1)
    count: np.ndarray   # [N] i32 (leaf: tri count, else 0)
    skip: np.ndarray    # [N] i32 (preorder index after this subtree; N = done)
    tris: np.ndarray    # [T,9] f32 — (v0, e1, e2) remapped per leaf

    @property
    def n_nodes(self) -> int:
        return self.bmin.shape[0]

    @property
    def n_tris(self) -> int:
        return self.tris.shape[0]

    def is_leaf(self, i: int) -> bool:
        return self.count[i] > 0


class BVHArrays(NamedTuple):
    """Device-side packed BVH (a pytree of jnp/np arrays).

    bounds: [N,8] f32 — bmin.xyz, bmax.xyz, pad, pad
    meta:   [N,4] i32 — skip, first, count, pad
    tris:   [T,12] f32 — v0.xyz, e1.xyz, e2.xyz, pad3
    """
    bounds: np.ndarray
    meta: np.ndarray
    tris: np.ndarray


def _tri_bounds(tris: np.ndarray):
    """AABB + centroid per triangle from (v0,e1,e2) rows
    (reference: src/scene/bvh.cpp:10-26)."""
    v0 = tris[:, 0:3]
    v1 = v0 + tris[:, 3:6]
    v2 = v0 + tris[:, 6:9]
    tmin = np.minimum(v0, np.minimum(v1, v2))
    tmax = np.maximum(v0, np.maximum(v1, v2))
    cent = (v0 + v1 + v2) / 3.0
    return tmin, tmax, cent


def build_bvh(tris: np.ndarray, leaf_max: int = LEAF_MAX) -> BVH:
    """Build the preorder skip-link BVH over tris [T,9] float32.

    Median split on longest axis by centroid (same splitting rule as
    reference: src/scene/bvh.cpp:70-81); triangles are remapped so each
    leaf's range is contiguous (reference: src/scene/bvh.cpp:109-136).
    """
    tris = np.ascontiguousarray(tris, np.float32)
    n_tris = tris.shape[0]
    if n_tris == 0:
        z3 = np.zeros((0, 3), np.float32)
        zi = np.zeros((0,), np.int32)
        return BVH(z3, z3, zi, zi, zi, zi, zi, tris)

    tmin, tmax, cent = _tri_bounds(tris)
    order = np.arange(n_tris, dtype=np.int64)

    bmin_l, bmax_l = [], []
    left_l, right_l, first_l, count_l, parent_l = [], [], [], [], []
    remapped: list[np.ndarray] = []
    remap_cursor = 0

    # Iterative preorder build: stack of (begin, end, parent_slot).
    # parent_slot: (+idx) fills left child of idx, (-idx-1) fills right.
    stack = [(0, n_tris, None)]
    while stack:
        begin, end, pslot = stack.pop()
        seg = order[begin:end]
        node_min = tmin[seg].min(axis=0)
        node_max = tmax[seg].max(axis=0)
        me = len(bmin_l)
        bmin_l.append(node_min)
        bmax_l.append(node_max)
        left_l.append(-1)
        right_l.append(-1)
        first_l.append(-1)
        count_l.append(0)
        parent_l.append(-1)
        if pslot is not None:
            if pslot >= 0:
                left_l[pslot] = me
                parent_l[me] = pslot
            else:
                right_l[-pslot - 1] = me
                parent_l[me] = -pslot - 1

        count = end - begin
        if count <= leaf_max:
            # Leaf: pack triangles contiguously in preorder-leaf order.
            remapped.append(tris[seg])
            first_l[me] = remap_cursor
            count_l[me] = count
            remap_cursor += count
            continue

        # Longest-extent axis, median split by centroid (argpartition ==
        # nth_element semantics: median element in place, halves unordered).
        # Same tie-breaking as the reference
        # (reference: src/scene/bvh.cpp:72): x wins only if strictly larger.
        ext = node_max - node_min
        if ext[0] > ext[1]:
            axis = 0 if ext[0] > ext[2] else 2
        else:
            axis = 1 if ext[1] > ext[2] else 2
        mid = (0 + count) // 2
        keys = cent[seg, axis]
        part = np.argpartition(keys, mid if mid < count else count - 1)
        order[begin:end] = seg[part]
        # Push right first so left is processed next (preorder, left-first).
        stack.append((begin + mid, end, -me - 1))
        stack.append((begin, begin + mid, me))

    n_nodes = len(bmin_l)
    bmin = np.asarray(bmin_l, np.float32).reshape(n_nodes, 3)
    bmax = np.asarray(bmax_l, np.float32).reshape(n_nodes, 3)
    left = np.asarray(left_l, np.int32)
    right = np.asarray(right_l, np.int32)
    first = np.asarray(first_l, np.int32)
    count = np.asarray(count_l, np.int32)

    # Skip links: skip[root] = N; for inner i: skip[left]=right,
    # skip[right]=skip[i].  Preorder guarantees left == i+1.
    skip = np.full(n_nodes, n_nodes, np.int32)
    for i in range(n_nodes):
        if count[i] == 0 and left[i] >= 0:
            skip[left[i]] = right[i]
            skip[right[i]] = skip[i]

    tris_remapped = (np.concatenate(remapped, axis=0)
                     if remapped else np.zeros((0, 9), np.float32))
    return BVH(bmin, bmax, left, right, first, count, skip,
               tris_remapped.astype(np.float32))


def build_bvh_fast(tris: np.ndarray, leaf_max: int = LEAF_MAX) -> BVH:
    """Build via the native C++ builder when available (identical layout
    contract; see native/bvh_native.cpp), else the numpy oracle."""
    from .. import native
    result = native.build_bvh(tris, leaf_max) if native.available() else None
    return result if result is not None else build_bvh(tris, leaf_max)


def bvh_to_arrays(bvh: BVH) -> BVHArrays:
    """Pack host BVH into the device layout."""
    n, t = bvh.n_nodes, bvh.n_tris
    bounds = np.zeros((max(n, 1), 8), np.float32)
    meta = np.zeros((max(n, 1), 4), np.int32)
    if n:
        bounds[:n, 0:3] = bvh.bmin
        bounds[:n, 3:6] = bvh.bmax
        meta[:n, 0] = bvh.skip
        meta[:n, 1] = bvh.first
        meta[:n, 2] = bvh.count
    else:
        meta[0, 0] = 1  # empty tree: immediately done
    tris = np.zeros((max(t, 1), 12), np.float32)
    if t:
        tris[:t, 0:9] = bvh.tris
    return BVHArrays(bounds, meta, tris)


def validate_bvh(bvh: BVH, tris_original: np.ndarray) -> None:
    """Structural invariants (used by tests).

    - every triangle appears exactly once across leaves
    - every leaf's triangles are inside the leaf AABB
    - child AABBs are inside parents; preorder + skip links consistent
    """
    n = bvh.n_nodes
    seen = np.zeros(bvh.n_tris, bool)
    for i in range(n):
        if bvh.count[i] > 0:
            f, c = int(bvh.first[i]), int(bvh.count[i])
            assert not seen[f:f + c].any()
            seen[f:f + c] = True
            tmin, tmax, _ = _tri_bounds(bvh.tris[f:f + c])
            assert (tmin >= bvh.bmin[i] - 1e-4).all()
            assert (tmax <= bvh.bmax[i] + 1e-4).all()
        else:
            l, r = int(bvh.left[i]), int(bvh.right[i])
            assert l == i + 1, "preorder: left child must follow parent"
            assert (bvh.bmin[l] >= bvh.bmin[i] - 1e-5).all()
            assert (bvh.bmax[r] <= bvh.bmax[i] + 1e-5).all()
            assert bvh.skip[l] == r and bvh.skip[r] == bvh.skip[i]
    assert seen.all(), "triangle lost in remap"
    # Multiset of triangles preserved (orderless compare via sorted bytes).
    a = np.sort(bvh.tris.round(5).view([('', np.float32)] * 9), axis=0)
    b = np.sort(np.ascontiguousarray(tris_original, np.float32).round(5)
                .view([('', np.float32)] * 9), axis=0)
    assert (a == b).all()
