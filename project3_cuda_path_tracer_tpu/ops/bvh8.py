"""8-wide BVH packet traversal — the "fewer, fatter steps" mesh intersector.

Motivation (measured, see BENCHMARKS.md + ops/pallas_bvh.py post-mortems):
the binary packet kernel's per-step cost is dominated by SCALAR work (the
shared cursor chain, node row loads, the any-lane reduction), while its
per-step VECTOR work (one AABB slab test over 1024 lanes) is cheap. The
8-cursor sub-packet experiment multiplied the scalar work 8x and lost 25x.
This kernel goes the other way: ONE shared cursor and stack, but each step
loads one wide node row and slab-tests EIGHT child boxes across all 1024
lanes — 8x the vector work per step, the same scalar overhead, and ~7x
fewer interior nodes to visit (an 8-ary tree has ~N/7 interior nodes vs
~N binary). Incoherent-packet unions shrink by the same factor because the
union is over tree PATHS, which are log8 deep instead of log2.

Measured on v5e (blob 81920 tris, 1024x1024 depth 8, vs the binary kernel's
1.13 s/iter):
  * naive version with one jnp.any vector->scalar reduction PER CHILD:
    0.69x (SLOWER) — the 8 cross-lane reductions per step dominate;
  * + fat leaves (WIDE_LEAF_K=15 subtree merge): 0.71x — leaf pops were
    not the bottleneck;
  * + bit-packed reductions (all 8 child masks summed through 4 int32
    accumulators -> 4 scalar reductions per step): 0.78 s/iter = 1.45x
    FASTER, images bit-identical;
  * + 2048-ray packets (SUB8 = 16): 0.72 s/iter = 1.57x;
  * a further cut to 3 reductions (sublane pre-reduce + binarize, the
    current form) measured NEUTRAL (716 ms) — below ~4 reductions per
    step something else binds; kept because it also frees the packet
    size from the accumulator field width.
The lesson for every packet kernel on this hardware: vector->scalar
reductions are the scarcest resource in a Mosaic while_loop — batch them.

Round-2 postscript, after microbenching the loop's parts in isolation
(tools/exp_extract_cost.py, exp_r2_batch7.py): at 3 reductions the kernel
is VECTOR-THROUGHPUT bound, not scalar bound — dynamic row loads pipeline
(fusing nodes_f+nodes_i into one row measured neutral), a 7-rotate OR-fold
replacing the 3 sums measured 36% WORSE (pltpu.roll is not cheap), and
multi-stream interleaving is neutral (Mosaic does not overlap the
streams' chains). What did win: shrinking the per-pop vector work —
WIDE_LEAF_K 15 -> 8 (blob 431 -> 390 ms/iter, textured 519 -> 469).
The deep inefficiency is incoherence itself: each pop's [sub, 128] vector
work serves only the few lanes that actually want that node (sim:
tools/exp_rebin_sim.py), and physical re-binning to fix it costs more in
XLA gathers than it saves (measured round 1; per-lane-column binning sim
gain was only ~1.3x at the depth that dominates).

Fills the same reference TODO as ops/pallas_bvh.py (mesh + acceleration
structure, reference: src/pathtrace.cu:188,308-309); produced images are
identical to the binary path (same nearest-hit semantics over the same
triangle table).

Layout (host-collapsed from the binned-SAH binary tree of scene/bvh.py):
  nodes_f [B8, 72] f32 — child c occupies cols [6c, 6c+6) = lo.xyz, hi.xyz;
                          empty slots hold NaN boxes (all slab compares
                          false, so they never vote);
                          col 64: ordered-pop threshold (midpoint of the
                          child centers' spread along the sort axis);
                          cols 65-71 pad;
  nodes_i [B8, 24] i32 — col c: child c's PRE-ENCODED stack entry (the
                          build-time form of what the kernel would push:
                          node row if interior, -(start*32+count)-2 if
                          leaf, 0 for empty slots — empty slots hold
                          NaN boxes so they can never win the slab vote,
                          making a validity field unnecessary);
                          col 16: child sort axis 0/1/2 (17-23 spare).
  tris    [T+1, 24] f32 — identical row format to ops/pallas_bvh.py.

Traversal: a scalar stack in SMEM holds encoded entries — v >= 0 is an
interior node row, v <= -2 is a leaf with meta = -v-2. Pop; if leaf, run
the LEAF_K Moller-Trumbore phase (vectorized over the packet, normals/uv
interpolated in-kernel); if interior, slab-test the 8 children and push
every child any lane entered. Per-ray t_best (seeded from the occlusion
bound) prunes subtrees on both the box test and the push.

Ordered traversal (round 2): the builder sorts each node's children
ascending by box center along the parent's largest-extent axis and stores
that axis in nodes_i[:, 16] plus the center-of-spread threshold in
nodes_f[:, 64]; the kernel pushes the children
in forward or reverse slot order so pops proceed near-to-far and each
lane's t_best tightens before far subtrees are slab-tested — the far
subtrees then fail `tmin < t_best` and are never pushed. Two vote modes:
  ordered="dir"      — packet-majority direction sign along the axis
                       (the CWBVH sign-ordering adapted to a shared
                       cursor); right for coherent frusta;
  ordered="centroid" — compare the packet's live-origin centroid against
                       the node's threshold (near-to-far FROM THE ORIGIN
                       CLUSTER); diffuse bounce packets have coherent
                       origins but no direction majority, so this is the
                       vote that survives incoherence. Default.
Both cost ~6 scalar ops per step + 3-4 one-time reductions.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..scene import types as T
from .pallas_bvh import SUB, LANES, PACKET, BIG, TRI_ROW

WIDTH = 8          # children per node
STACK = 128        # SMEM stack entries (512 bytes); builder asserts it fits
# Smallest normal f32: `x > 0` == `x >= _TINY` under the TPU's
# flush-to-zero arithmetic (used to fold slab compares).
_TINY = float(np.finfo(np.float32).tiny)
# Packet size: SUB8*128 rays share one cursor+stack. Measured on the blob
# (1024x1024 d8): sub=8 784 ms, sub=16 718 ms, sub=32 861 ms — bigger
# packets amortize the per-step scalar cost until union growth wins.
SUB8 = 16
# Fat leaves: a whole binary SUBTREE whose triangles (contiguous in the
# DFS perm order) number <= WIDE_LEAF_K becomes ONE leaf child.
WIDE_LEAF_K = 4    # meta = start*32 + count (encoding allows up to 31).
# Swept on v5e across rounds: 31 regressed (blob 720 -> 787 ms/iter),
# 15 -> 9 -> 8 -> 4 monotonically improved (431 -> 400 -> 390 -> 350
# ms/iter blob, 421 -> 405 textured_env_proc at the 8 -> 4 step with the
# binary tree rebuilt at leaf 4; 2 regressed to 376 — tools/exp_leaf4.py);
# sub re-swept at this shape: 16 still optimal (8: 377, 32: 391).
# The kernel is VECTOR-throughput
# bound on wasted lanes (incoherent packets want few tris per leaf pop),
# so the ~80-op Moller-Trumbore+interp unroll per tri costs more than the
# extra pops a shallower merge causes. 4 = the binary SAH leaf max
# (ops/intersect.LEAF_K), i.e. the merge only fuses single-leaf subtrees.


class PackedMesh8(NamedTuple):
    """One mesh in the 8-wide VMEM layout (root node = row 0)."""
    nodes_f: jnp.ndarray   # [B8, 64] f32
    nodes_i: jnp.ndarray   # [B8, 16] i32
    tris: jnp.ndarray      # [T+1, TRI_ROW] f32
    # Fused all-f32 node row (one aligned [128] load per interior pop
    # instead of nodes_f + nodes_i): cols 0-47 child boxes, 48-55 child
    # stack encodings stored as f32 (exact below 2^24 — builder asserts),
    # 56 sort axis, 57 centroid threshold. Default traversal input.
    nodes: jnp.ndarray = None  # [B8, 128] f32
    # Deferred-attribute split (defer_attrs traversal): the kernel only
    # needs the Moller-Trumbore geometry (v0, e1, e2 = tris cols 0-9);
    # the winning triangle's shading attributes are fetched AFTER the
    # traversal with one XLA row gather from this table.
    # Cols: n0 xyz, n1 xyz, n2 xyz, uv0, uv1, uv2 (15 used, 1 pad).
    attrs: jnp.ndarray = None  # [T+1, 16] f32
    # Kernel-side MT-only tri table (rows = tris cols 0-9, 16-col
    # aligned): halves the VMEM the traversal pins per mesh.
    tris_mt: jnp.ndarray = None  # [T+1, 16] f32

    @property
    def vmem_bytes(self) -> int:
        return 4 * (self.nodes_f.size + self.nodes_i.size + self.tris.size)


def _local_binary(meshes: T.MeshBundle, mesh_index: int):
    """Rebase one mesh's binary BVH out of the concatenated bundle:
    node indices local (root 0), tri starts local."""
    roots = np.asarray(meshes.mesh_root, np.int64)
    tri_offs = np.asarray(meshes.mesh_tri_offset, np.int64)
    b_total = np.asarray(meshes.node_lo).shape[0]
    t_total = np.asarray(meshes.tri_v0).shape[0]
    n0 = int(roots[mesh_index])
    n1 = int(roots[mesh_index + 1]) if mesh_index + 1 < len(roots) else b_total
    t0 = int(tri_offs[mesh_index])
    t1 = (int(tri_offs[mesh_index + 1]) if mesh_index + 1 < len(tri_offs)
          else t_total)
    lo = np.asarray(meshes.node_lo, np.float32)[n0:n1]
    hi = np.asarray(meshes.node_hi, np.float32)[n0:n1]
    start = np.asarray(meshes.node_start, np.int64)[n0:n1]
    count = np.asarray(meshes.node_count, np.int64)[n0:n1]
    right = np.asarray(meshes.node_right, np.int64)[n0:n1]
    start = np.where(count > 0, start - t0, -1)
    right = np.where(right >= 0, right - n0, -1)
    return lo, hi, start, count, right, t0, t1


def _pack_tris(meshes: T.MeshBundle, t0: int, t1: int) -> np.ndarray:
    t = t1 - t0
    sl = slice(t0, t1)
    # +8 degenerate pad rows (det = 0 -> never hit): block leaf loads
    # of up to 8 rows starting at the last leaf stay in bounds
    tris = np.zeros((t + 8, TRI_ROW), np.float32)
    tris[:t, 0:3] = np.asarray(meshes.tri_v0, np.float32)[sl]
    tris[:t, 3:6] = np.asarray(meshes.tri_e1, np.float32)[sl]
    tris[:t, 6:9] = np.asarray(meshes.tri_e2, np.float32)[sl]
    tris[:t, 9:12] = np.asarray(meshes.tri_n0, np.float32)[sl]
    tris[:t, 12:15] = np.asarray(meshes.tri_n1, np.float32)[sl]
    tris[:t, 15:18] = np.asarray(meshes.tri_n2, np.float32)[sl]
    tris[:t, 18:20] = np.asarray(meshes.tri_uv0, np.float32)[sl]
    tris[:t, 20:22] = np.asarray(meshes.tri_uv1, np.float32)[sl]
    tris[:t, 22:24] = np.asarray(meshes.tri_uv2, np.float32)[sl]
    return tris


def pack_mesh8(meshes: T.MeshBundle, mesh_index: int = 0) -> PackedMesh8:
    """Collapse one mesh's binary BVH into the 8-wide layout.

    Collapse rule: start from a binary interior node's two children and
    repeatedly replace the interior child with the LARGEST surface area by
    its two children until 8 slots are used (the classic BVH8 grow-widest
    heuristic — the biggest boxes are the ones most worth testing early
    and in parallel).
    """
    lo, hi, start, count, right, t0, t1 = _local_binary(meshes, mesh_index)
    b_n = lo.shape[0]

    # Subtree tri ranges (contiguous because flattening is DFS with
    # leaf-contiguous perm, scene/bvh.py): reverse-index post-order pass.
    r0 = np.full(b_n, -1, np.int64)
    r1 = np.full(b_n, -1, np.int64)
    for b in range(b_n - 1, -1, -1):
        if count[b] > 0:
            r0[b], r1[b] = start[b], start[b] + count[b]
        else:
            l, r = b + 1, int(right[b])
            r0[b] = min(r0[l], r0[r])
            r1[b] = max(r1[l], r1[r])

    def is_fat_leaf(k: int) -> bool:
        return count[k] > 0 or (r1[k] - r0[k]) <= WIDE_LEAF_K

    def leaf_meta(k: int) -> int:
        s, c = (int(start[k]), int(count[k])) if count[k] > 0 else (
            int(r0[k]), int(r1[k] - r0[k]))
        assert 0 < c <= WIDE_LEAF_K
        return s * 32 + c

    nodes_f_rows: list = []
    nodes_i_rows: list = []

    def kids_of(b: int):
        kids = [b + 1, int(right[b])]
        while len(kids) < WIDTH:
            best_i, best_sa = -1, -1.0
            for i, k in enumerate(kids):
                if not is_fat_leaf(k):
                    d = np.maximum(hi[k] - lo[k], 0.0)
                    sa = float(d[0] * d[1] + d[1] * d[2] + d[2] * d[0])
                    if sa > best_sa:
                        best_sa, best_i = sa, i
            if best_i < 0:
                break
            k = kids.pop(best_i)
            kids.append(k + 1)
            kids.append(int(right[k]))
        return kids

    max_depth = 0

    def build(b: int, depth: int) -> int:
        nonlocal max_depth
        max_depth = max(max_depth, depth)
        my = len(nodes_f_rows)
        f = np.zeros(72, np.float32)
        ii = np.full(24, -1, np.int32)
        nodes_f_rows.append(f)
        nodes_i_rows.append(ii)
        kids = kids_of(b)
        # Ordered traversal: sort children ascending by box center along
        # the parent's largest axis so the kernel can pop near-to-far by
        # choosing forward or reverse push order per packet.
        axis = int(np.argmax(hi[b] - lo[b]))
        kids.sort(key=lambda k: float(lo[k][axis] + hi[k][axis]))
        ii[16] = axis
        centers = [0.5 * float(lo[k][axis] + hi[k][axis]) for k in kids]
        f[64] = 0.5 * (centers[0] + centers[-1])  # centroid-vote threshold
        ii[:16] = 0
        for c, k in enumerate(kids):
            f[6 * c: 6 * c + 3] = lo[k]
            f[6 * c + 3: 6 * c + 6] = hi[k]
            if is_fat_leaf(k):
                ii[c] = -leaf_meta(k) - 2
        for c in range(len(kids), WIDTH):
            # NaN box: every slab comparison is false, so an empty slot
            # can never win the vote (an inverted +/-BIG box would — the
            # min/max slab test normalizes interval order)
            f[6 * c: 6 * c + 6] = np.nan
        for c, k in enumerate(kids):
            if not is_fat_leaf(k):
                ii[c] = build(k, depth + 1)
        return my

    if count[0] > 0:
        # whole mesh is a single binary leaf: one 8-wide node, one leaf slot
        f = np.zeros(72, np.float32)
        ii = np.full(24, -1, np.int32)
        ii[:16] = 0
        ii[16] = 0
        f[0:3], f[3:6] = lo[0], hi[0]
        for c in range(1, WIDTH):
            f[6 * c: 6 * c + 6] = np.nan
        ii[0] = -(int(start[0]) * 32 + int(count[0])) - 2
        nodes_f_rows.append(f)
        nodes_i_rows.append(ii)
        max_depth = 1
    else:
        import sys
        old = sys.getrecursionlimit()
        sys.setrecursionlimit(max(old, 10000))
        try:
            build(0, 1)
        finally:
            sys.setrecursionlimit(old)

    # Worst-case stack: each level on the DFS path parks <= WIDTH-1 residual
    # siblings, plus the current node's <= WIDTH pushes, plus <= WIDTH-1
    # trailing garbage stores above the live top (fastpush writes every
    # child slot unconditionally).
    bound = (WIDTH - 1) * max_depth + WIDTH + (WIDTH - 1)
    assert bound <= STACK, (
        f"BVH8 worst-case stack {bound} exceeds kernel STACK={STACK} "
        f"(tree depth {max_depth}); raise STACK in ops/bvh8.py")

    nf = np.stack(nodes_f_rows)
    ni = np.stack(nodes_i_rows)
    # Fused row: all-f32 so one aligned [128] vector load serves the whole
    # interior phase (two dynamic row loads per pop measured additive in
    # the Mosaic while loop — tools/exp_extract_cost.py).
    assert np.abs(ni[:, :8].astype(np.int64)).max(initial=0) < (1 << 24), \
        "child stack encoding exceeds f32 exact-integer range"
    fused = np.zeros((nf.shape[0], 128), np.float32)
    fused[:, 0:48] = nf[:, 0:48]
    fused[:, 48:56] = ni[:, :8].astype(np.float32)
    fused[:, 56] = ni[:, 16].astype(np.float32)
    fused[:, 57] = nf[:, 64]
    tris = _pack_tris(meshes, t0, t1)
    attrs = np.zeros((tris.shape[0], 16), np.float32)
    attrs[:, 0:15] = tris[:, 9:24]          # n0 n1 n2 uv0 uv1 uv2
    tris_mt = np.zeros((tris.shape[0], 16), np.float32)
    tris_mt[:, 0:9] = tris[:, 0:9]          # v0 e1 e2
    return PackedMesh8(
        nodes_f=jnp.asarray(nf),
        nodes_i=jnp.asarray(ni),
        tris=jnp.asarray(tris),
        nodes=jnp.asarray(fused),
        attrs=jnp.asarray(attrs),
        tris_mt=jnp.asarray(tris_mt))


def pack_all8(meshes: T.MeshBundle):
    """One PackedMesh8 per mesh in the bundle (empty tuple for no meshes)."""
    k = int(np.asarray(meshes.mesh_root).shape[0])
    if int(np.asarray(meshes.tri_v0).shape[0]) <= 1:
        return ()
    return tuple(pack_mesh8(meshes, i) for i in range(k))


def enable_wide_bvh(scene) -> None:
    """Switch a loaded Scene's mesh traversal to the 8-wide kernel in place
    (the integrator dispatches on the packed type)."""
    scene.packed_meshes = pack_all8(scene.meshes)




def _traverse8_kernel(leaf_k: int, max_steps: int, sub: int = SUB,
                      ordered: str = "centroid", streams: int = 1,
                      fused: bool = False, reduce_mode: str = "sum3",
                      any_hit: bool = False, defer_attrs: bool = False,
                      block_leaf: bool = False, fastpush: bool = False):
    """Kernel body: stack-based 8-wide traversal, `streams` independent
    packets per grid step.

    `sub` sublane rows per packet (packet = sub*128 rays). Bigger packets
    amortize the per-step scalar cost (stack ops, 3 reductions) over more
    rays; for incoherent bounce wavefronts the node union grows slowly
    with packet size, so fewer, larger packets win (measured below).

    `streams` > 1 interleaves that many packets (own stack, cursor, hit
    state) inside ONE while loop: the per-pop cost is ~1 us nearly
    independent of vector width (measured sub=8..32), i.e. the loop is
    LATENCY-bound on its scalar chain (pop -> row load -> reduce -> push),
    so two independent chains overlap and hide each other's latency. A
    stream whose stack empties idles (masked) until the slowest stream of
    the group finishes — pair adjacent packets so pop counts correlate.
    """

    def kernel(qox_ref, qoy_ref, qoz_ref, qdx_ref, qdy_ref, qdz_ref,
               tmax_ref, *rest):
        if defer_attrs:
            if fused:
                (nodes_ref, tris_ref, t_ref, bu_ref, bv_ref, tri_ref,
                 steps_ref, stack_ref) = rest
            else:
                (nodes_f_ref, nodes_i_ref, tris_ref, t_ref, bu_ref,
                 bv_ref, tri_ref, steps_ref, stack_ref) = rest
        elif fused:
            (nodes_ref, tris_ref, t_ref, nx_ref, ny_ref, nz_ref, u_ref,
             v_ref, tri_ref, steps_ref, stack_ref) = rest
        else:
            (nodes_f_ref, nodes_i_ref, tris_ref, t_ref, nx_ref, ny_ref,
             nz_ref, u_ref, v_ref, tri_ref, steps_ref, stack_ref) = rest
        S = streams
        PW = 5 if defer_attrs else 8   # per-stream carry width

        def rows(ref, s):
            return ref[s * sub:(s + 1) * sub]

        qox = [rows(qox_ref, s) for s in range(S)]
        qoy = [rows(qoy_ref, s) for s in range(S)]
        qoz = [rows(qoz_ref, s) for s in range(S)]
        qdx = [rows(qdx_ref, s) for s in range(S)]
        qdy = [rows(qdy_ref, s) for s in range(S)]
        qdz = [rows(qdz_ref, s) for s in range(S)]
        idx = [1.0 / v for v in qdx]
        idy = [1.0 / v for v in qdy]
        idz = [1.0 / v for v in qdz]
        tmax0 = [rows(tmax_ref, s) for s in range(S)]

        shape = (sub, LANES)
        zero = jnp.zeros(shape, jnp.float32)

        # One-time per-stream vote state (3-4 scalar reductions over live
        # lanes; dead/pad lanes are t_bound <= 0 and do not vote).
        votes = []
        for s in range(S):
            stack_ref[s, 0] = jnp.int32(0)   # root node row
            live = tmax0[s] > 0.0
            if ordered == "dir":
                # Majority direction sign per axis: pops proceed
                # near-to-far along the node sort axis for the majority
                # direction.
                n_live = jnp.sum(live.astype(jnp.int32))
                votes.append(tuple(
                    jnp.sum(((d > 0) & live).astype(jnp.int32)) * 2 > n_live
                    for d in (qdx[s], qdy[s], qdz[s])))
            elif ordered == "centroid":
                # Live-origin centroid: pops proceed near-to-far FROM THE
                # ORIGIN CLUSTER (diffuse bounce packets have coherent
                # origins but no direction majority). Compared per node
                # against the build-time child-spread midpoint
                # nodes_f[:, 64].
                livef = live.astype(jnp.float32)
                inv_n = 1.0 / jnp.maximum(jnp.sum(livef), 1.0)
                votes.append((jnp.sum(qox[s] * livef) * inv_n,
                              jnp.sum(qoy[s] * livef) * inv_n,
                              jnp.sum(qoz[s] * livef) * inv_n))
            else:
                votes.append(None)

        # carry: step, then per stream — defer_attrs: (sp, t_best, bu, bv,
        # tri); full: (sp, t_best, nx, ny, nz, uu, vv, tri)
        miss = jnp.full(shape, -1, jnp.int32)
        init = (jnp.int32(0),) + tuple(
            x for s in range(S)
            for x in ((jnp.int32(1), tmax0[s], zero, zero, miss)
                      if defer_attrs else
                      (jnp.int32(1), tmax0[s], zero, zero, zero, zero,
                       zero, miss)))

        def unpack(state):
            step = state[0]
            per = [state[1 + PW * s: 1 + PW * (s + 1)] for s in range(S)]
            return step, per

        def cond(state):
            step, per = unpack(state)
            any_live = per[0][0] > 0
            for s in range(1, S):
                any_live = any_live | (per[s][0] > 0)
            return any_live & (step < max_steps)

        def stream_step(s, st):
            if defer_attrs:
                sp, t_best, ubu, ubv, tri = st
            else:
                sp, t_best, nx, ny, nz, uu, vv, tri = st
            active = sp > 0
            sp1 = jnp.maximum(sp - 1, 0)
            entry = stack_ref[s, sp1]
            is_int = entry >= 0
            # meta gated by the leaf predicate so an idle stream's stale
            # slot-0 entry cannot index the triangle table out of range
            do_leaf_p = active & ~is_int
            meta = jnp.where(do_leaf_p, -entry - 2, 0)

            def do_leaf(args):
                if defer_attrs:
                    t_best, ubu, ubv, tri = args
                else:
                    t_best, nx, ny, nz, uu, vv, tri = args
                start = meta // 32
                count = meta - start * 32
                if block_leaf:
                    # one [leaf_k, W] block load replaces leaf_k dynamic
                    # row loads (leaf tris are contiguous by construction)
                    rows_blk = tris_ref[pl.ds(start, leaf_k)]
                for k in range(leaf_k):
                    r = rows_blk[k] if block_leaf else tris_ref[start + k]
                    in_leaf = k < count
                    v0x, v0y, v0z = r[0], r[1], r[2]
                    e1x, e1y, e1z = r[3], r[4], r[5]
                    e2x, e2y, e2z = r[6], r[7], r[8]
                    pvx = qdy[s] * e2z - qdz[s] * e2y
                    pvy = qdz[s] * e2x - qdx[s] * e2z
                    pvz = qdx[s] * e2y - qdy[s] * e2x
                    det = e1x * pvx + e1y * pvy + e1z * pvz
                    ok_det = jnp.abs(det) > 1e-12
                    inv_det = jnp.where(ok_det, 1.0 / det, 0.0)
                    tvx = qox[s] - v0x
                    tvy = qoy[s] - v0y
                    tvz = qoz[s] - v0z
                    bu = (tvx * pvx + tvy * pvy + tvz * pvz) * inv_det
                    qvx = tvy * e1z - tvz * e1y
                    qvy = tvz * e1x - tvx * e1z
                    qvz = tvx * e1y - tvy * e1x
                    bv = (qdx[s] * qvx + qdy[s] * qvy + qdz[s] * qvz) \
                        * inv_det
                    t_k = (e2x * qvx + e2y * qvy + e2z * qvz) * inv_det
                    hit_k = (ok_det & (bu >= 0) & (bv >= 0)
                             & (bu + bv <= 1) & (t_k > 1e-6)
                             & (t_k < t_best) & in_leaf)
                    t_best = jnp.where(hit_k, t_k, t_best)
                    if defer_attrs:
                        # Shading attributes (smooth normal, uv) of the
                        # WINNING triangle are fetched after the traversal
                        # with one XLA row gather by `tri` — the per-
                        # candidate interpolation is pure wasted vector
                        # work inside the hot Mosaic loop.
                        ubu = jnp.where(hit_k, bu, ubu)
                        ubv = jnp.where(hit_k, bv, ubv)
                    else:
                        bw = 1.0 - bu - bv
                        nkx = bw * r[9] + bu * r[12] + bv * r[15]
                        nky = bw * r[10] + bu * r[13] + bv * r[16]
                        nkz = bw * r[11] + bu * r[14] + bv * r[17]
                        uk = bw * r[18] + bu * r[20] + bv * r[22]
                        vk = bw * r[19] + bu * r[21] + bv * r[23]
                        nx = jnp.where(hit_k, nkx, nx)
                        ny = jnp.where(hit_k, nky, ny)
                        nz = jnp.where(hit_k, nkz, nz)
                        uu = jnp.where(hit_k, uk, uu)
                        vv = jnp.where(hit_k, vk, vv)
                    tri = jnp.where(hit_k, start + k, tri)
                if any_hit:
                    # Occlusion mode (NEE shadow rays): a lane with ANY
                    # hit is done — collapse its t interval to ~0 so no
                    # further node passes the slab test (tmin < t_best)
                    # and the lane stops contributing to packet unions.
                    # Kept small-POSITIVE: t_best = 0 is the dead-lane
                    # sentinel and would read as "no hit" to the caller.
                    t_best = jnp.where(tri >= 0, 1e-5, t_best)
                if defer_attrs:
                    return t_best, ubu, ubv, tri
                return t_best, nx, ny, nz, uu, vv, tri

            hit_state = ((t_best, ubu, ubv, tri) if defer_attrs
                         else (t_best, nx, ny, nz, uu, vv, tri))
            if not fastpush:
                hit_state = jax.lax.cond(
                    do_leaf_p, do_leaf, lambda a: a, hit_state)

            int_active = is_int & active

            def do_interior(sp_in):
                # Only interior pops pay for the row loads, slab tests,
                # reductions, and push chain. Fat leaves make LEAF pops the
                # majority of all pops, so gating this whole phase (rather
                # than just the pushes) removes most of the per-pop scalar
                # cost on the majority path.
                safe = jnp.maximum(entry, 0)
                if fused:
                    # one aligned [128] row load serves boxes, encodings
                    # (f32-exact ints), sort axis, and threshold — the
                    # second row load measured additive (not overlapped)
                    # in the while-loop chain (tools/exp_extract_cost.py)
                    rowf = nodes_ref[safe]
                else:
                    rowf = nodes_f_ref[safe]   # [72] one wide row load
                    rowi = nodes_i_ref[safe]   # [24]

                # Slab-test all 8 children, bit-packing the lane masks so
                # the expensive vector->scalar reduction happens 3x instead
                # of 8x: each child's mask is first sum-reduced over the
                # SUBLANE axis (cheap, stays vector-shaped) and binarized
                # to one bit per lane column, so child c occupies a 9-bit
                # field (column count <= 128 fits) in one of three
                # [1, LANES] int32 accumulators; one sum-reduce per
                # accumulator then yields all per-child any-lane-hit
                # counts.
                accs = [jnp.zeros((1, LANES), jnp.int32) for _ in range(3)]
                bits_vec = jnp.zeros((1, LANES), jnp.int32)
                # Fold the 4-term lane predicate into 2 compares + 1 and
                # per child (exact): `tmin < t_best & t_best > 0` becomes
                # `tmin < tbm` with dead lanes' bound collapsed to -inf
                # (tmin is never -inf below -BIG boxes; -inf < -inf is
                # false either way), and `tmax >= tmin & tmax > 0` becomes
                # `tmax >= max(tmin, TINY)` (TPU flushes subnormals, so
                # tmax in (0, TINY) cannot occur; NaN boxes still fail
                # every compare). Saves 3 vector ops per child per pop.
                tbm = jnp.where(t_best > 0, t_best, -jnp.inf)
                for c in range(WIDTH):
                    lox, loy, loz = (rowf[6 * c], rowf[6 * c + 1],
                                     rowf[6 * c + 2])
                    hix, hiy, hiz = (rowf[6 * c + 3], rowf[6 * c + 4],
                                     rowf[6 * c + 5])
                    t1x = (lox - qox[s]) * idx[s]
                    t2x = (hix - qox[s]) * idx[s]
                    t1y = (loy - qoy[s]) * idy[s]
                    t2y = (hiy - qoy[s]) * idy[s]
                    t1z = (loz - qoz[s]) * idz[s]
                    t2z = (hiz - qoz[s]) * idz[s]
                    tmin = jnp.maximum(jnp.minimum(t1x, t2x),
                                       jnp.maximum(jnp.minimum(t1y, t2y),
                                                   jnp.minimum(t1z, t2z)))
                    tmax = jnp.minimum(jnp.maximum(t1x, t2x),
                                       jnp.minimum(jnp.maximum(t1y, t2y),
                                                   jnp.maximum(t1z, t2z)))
                    # `tbm = -inf` deadens sentinel lanes (t_bound <= 0:
                    # pads and terminated paths) exactly — without it a box
                    # that straddles a dead lane's origin can give
                    # tmin < -1 and leak a vote into the packet union.
                    lane_hit = ((tmax >= jnp.maximum(tmin, _TINY))
                                & (tmin < tbm))
                    col = jnp.sum(lane_hit.astype(jnp.int32), axis=0,
                                  keepdims=True)        # [1, LANES] <= sub
                    bit = (col > 0).astype(jnp.int32)
                    if reduce_mode == "rollor":
                        bits_vec = bits_vec | (bit << c)
                    else:
                        accs[c % 3] = accs[c % 3] + (bit << (9 * (c // 3)))
                if reduce_mode == "rollor":
                    # OR-fold the per-lane child bitmasks across lanes
                    # (7 cheap vector rotates), then ONE vector->scalar
                    # reduction yields all 8 any-lane-hit bits — replaces
                    # the 3 packed-accumulator sums (each vector->scalar
                    # reduction costs ~a round-trip in the loop's serial
                    # chain, tools/exp_extract_cost.py).
                    for sh in (1, 2, 4, 8, 16, 32, 64):
                        bits_vec = bits_vec | pltpu.roll(bits_vec, sh, 1)
                    mask = jnp.max(bits_vec)
                else:
                    sums = [jnp.sum(a) for a in accs]  # 3 scalar reductions

                # Child encodings are precomputed at build time (cols 0-7
                # of nodes_i / cols 48-55 of the fused row hold exactly the
                # value to push); empty slots hold NaN boxes so hit_count
                # is 0 there — no validity check.
                pushes = []
                encs = []
                for c in range(WIDTH):
                    if reduce_mode == "rollor":
                        push = ((mask >> c) & 1) > 0
                    else:
                        hit_count = (sums[c % 3] >> (9 * (c // 3))) & 0x1FF
                        push = hit_count > 0
                    encs.append(jnp.int32(rowf[48 + c]) if fused
                                else rowi[c])
                    pushes.append(push.astype(jnp.int32))

                def push_loop(order):
                    def run(newsp):
                        for c in order:
                            # Unconditional store into the first dead
                            # slot; only a push advances newsp, so
                            # non-pushed stores are overwritten or fall
                            # beyond the live stack.
                            stack_ref[s, newsp] = encs[c]
                            newsp = newsp + pushes[c]
                        return newsp
                    return run

                rev = None
                if ordered:
                    # Children are build-sorted ascending along the sort
                    # axis; pops are LIFO, so push far-first: ascending
                    # slot order when the near side is the HIGH end,
                    # descending when it is the low end. ~6 scalar ops +
                    # a branch per step.
                    axis = jnp.int32(rowf[56]) if fused else rowi[16]
                    if ordered == "dir":
                        rev = ((axis == 0) & votes[s][0]
                               | (axis == 1) & votes[s][1]
                               | (axis == 2) & votes[s][2])
                    else:
                        thr = rowf[57] if fused else rowf[64]
                        ca = jnp.where(axis == 0, votes[s][0],
                                       jnp.where(axis == 1, votes[s][1],
                                                 votes[s][2]))
                        # rev pushes slots 7..0 so slot 0 (lowest center)
                        # pops first — choose it when the origin cluster
                        # is at the LOW end of the child spread
                        rev = ca < thr

                if fastpush:
                    # Serial-chain shave: the 8-step `newsp` add chain
                    # becomes a depth-3 prefix tree, and the rev branch
                    # becomes 16 parallel scalar selects — the push
                    # phase's serial depth drops from ~10 to ~4 stages.
                    if rev is not None:
                        ordn = [jnp.where(rev, x, y) for x, y in
                                zip(pushes[::-1], pushes)]
                        orde = [jnp.where(rev, x, y) for x, y in
                                zip(encs[::-1], encs)]
                    else:
                        ordn, orde = pushes, encs
                    # inclusive prefix (Hillis-Steele, depth 3)
                    inc = list(ordn)
                    for sh in (1, 2, 4):
                        inc = [inc[i] + (inc[i - sh] if i >= sh else 0)
                               for i in range(WIDTH)]
                    for c in range(WIDTH):
                        # exclusive offset; non-pushed stores land on the
                        # next pushed child's slot and are overwritten by
                        # it (stores execute in program order), or fall
                        # beyond the live stack top (never popped).
                        off = sp_in if c == 0 else sp_in + inc[c - 1]
                        stack_ref[s, off] = orde[c]
                    return sp_in + inc[WIDTH - 1]
                if rev is not None:
                    return jax.lax.cond(
                        rev, push_loop(range(WIDTH - 1, -1, -1)),
                        push_loop(range(WIDTH)), sp_in)
                return push_loop(range(WIDTH))(sp_in)

            if fastpush:
                # One branch per pop instead of two: a pop is exactly one
                # of {interior, leaf, idle}; idle streams take the leaf
                # arm with meta gated to a no-op.
                full = jax.lax.cond(
                    int_active,
                    lambda a: (do_interior(a[0]),) + a[1:],
                    lambda a: (a[0],) + do_leaf(a[1:]),
                    (sp1,) + hit_state)
                newsp, hit_state = full[0], full[1:]
            else:
                newsp = jax.lax.cond(int_active, do_interior,
                                     lambda x: x, sp1)
            newsp = jnp.where(active, newsp, 0)
            return (newsp,) + tuple(hit_state)

        def body(state):
            step, per = unpack(state)
            out = []
            for s in range(S):
                out.extend(stream_step(s, per[s]))
            return (step + 1,) + tuple(out)

        out = jax.lax.while_loop(cond, body, init)
        step, per = unpack(out)
        steps_ref[0] = jnp.full((8, LANES), step, jnp.int32)  # pop count
        for s in range(S):
            sl = slice(s * sub, (s + 1) * sub)
            if defer_attrs:
                _, t_best, ubu, ubv, tri = per[s]
                t_ref[sl] = t_best
                bu_ref[sl] = ubu
                bv_ref[sl] = ubv
                tri_ref[sl] = tri
            else:
                _, t_best, nx, ny, nz, uu, vv, tri = per[s]
                t_ref[sl] = t_best
                nx_ref[sl] = nx
                ny_ref[sl] = ny
                nz_ref[sl] = nz
                u_ref[sl] = uu
                v_ref[sl] = vv
                tri_ref[sl] = tri

    return kernel


@functools.partial(jax.jit,
                   static_argnames=("leaf_k", "max_steps", "interpret",
                                    "sub", "ordered", "streams", "fused",
                                    "reduce_mode", "any_hit",
                                    "defer_attrs", "block_leaf",
                                    "fastpush"))
def _traverse8(qo_planes, qd_planes, t_bound, node_arrays, tris,
               leaf_k, max_steps, interpret, sub, ordered="centroid",
               streams=1, fused=False, reduce_mode="sum3", any_hit=False,
               defer_attrs=False, block_leaf=False, fastpush=False):
    n = qo_planes[0].shape[0]
    group = streams * sub * LANES
    assert n % group == 0
    rows = n // LANES
    grid = n // group

    def as2d(a):
        return a.reshape(rows, LANES)

    block = pl.BlockSpec((streams * sub, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    plane_f = jax.ShapeDtypeStruct((rows, LANES), jnp.float32)
    plane_i = jax.ShapeDtypeStruct((rows, LANES), jnp.int32)

    n_planes = 3 if defer_attrs else 6   # f32 outputs before `tri`
    kernel = _traverse8_kernel(leaf_k, max_steps, sub, ordered, streams,
                               fused, reduce_mode, any_hit, defer_attrs,
                               block_leaf, fastpush)
    outs = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[block] * 7 + [full] * (len(node_arrays) + 1),
        out_specs=(block,) * (n_planes + 1) + (
            pl.BlockSpec((1, 8, LANES), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),),
        out_shape=(plane_f,) * n_planes + (
            plane_i,
            jax.ShapeDtypeStruct((grid, 8, LANES), jnp.int32)),
        scratch_shapes=[pltpu.SMEM((streams, STACK), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*(as2d(p) for p in qo_planes), *(as2d(p) for p in qd_planes),
      as2d(t_bound), *node_arrays, tris)
    return (tuple(o.reshape(-1) for o in outs[:n_planes + 1])
            + (outs[n_planes + 1],))


def traverse_packets8(qo, qd, packed: PackedMesh8, leaf_k: int = WIDE_LEAF_K,
                      max_steps: int = 2 ** 20, t_bound=None,
                      sub: int = SUB8, ordered: str = "centroid",
                      streams: int = 1, return_steps: bool = False,
                      fused: bool = False, reduce_mode: str = "sum3",
                      any_hit: bool = False, defer_attrs: bool = None,
                      block_leaf: bool = False, fastpush: bool = False):
    """Nearest-hit over the 8-wide packed mesh; drop-in signature/return
    match for ops/pallas_bvh.traverse_packets (t_obj, (nx,ny,nz), u, v,
    tri with -1 = miss). `sub`*128 rays share one cursor+stack.
    `ordered` picks the near-to-far pop vote ("dir", "centroid", or False
    for build order); `streams` packets run interleaved per kernel
    instance (latency hiding). `return_steps` appends the per-group
    pop-count diagnostic [grid]. `fused` loads one all-f32 node row per
    interior pop (vs separate f32+i32 rows); `reduce_mode` "rollor" votes
    via a lane OR-fold + one reduction (vs "sum3" packed sums).
    `defer_attrs` (default on when the packed mesh carries the split
    tables) keeps normal/uv interpolation OUT of the Mosaic loop: the
    kernel tracks (t, bu, bv, tri) only and the winning triangle's
    attributes come from one XLA row gather afterwards."""
    n = qo[0].shape[0]
    if defer_attrs is None:
        # MEASURED NEGATIVE as the default (round 3, tools/exp_defer.py):
        # removing the in-kernel interpolation saved ~nothing (the leaf
        # phase is not ALU-bound at the margin) while the XLA row gather
        # for the winners costs ~16 ms per 1M rays (0.9 G elem/s) —
        # blob 351 -> 496 ms/iter. Kept as an option; the measurement
        # also dates the "gathers are the texture wall" finding.
        defer_attrs = False
    if t_bound is None:
        t_bound = jnp.full((n,), BIG, jnp.float32)
    if n < streams * sub * LANES:   # small wavefronts: shrink, don't pad 4x
        streams = 1
    packet = sub * LANES
    if n < packet:
        sub = SUB
        packet = sub * LANES
    group = streams * packet
    pad = (-n) % group
    if pad:
        padp = lambda a, val: jnp.concatenate(
            [a, jnp.full((pad,), val, a.dtype)])
        qo = tuple(padp(c, 0.0) for c in qo)
        qd = tuple(padp(c, 1.0) for c in qd)
        t_bound = jnp.concatenate(
            [t_bound, jnp.full((pad,), -1.0, jnp.float32)])
    interpret = jax.default_backend() == "cpu"
    if packed.nodes is None:     # packed before the fused layout existed
        fused = False
    node_arrays = ((packed.nodes,) if fused
                   else (packed.nodes_f, packed.nodes_i))
    if defer_attrs:
        tri_table = packed.tris_mt if packed.tris_mt is not None \
            else packed.tris
        t, bu, bv, tri, steps = _traverse8(
            tuple(qo), tuple(qd), t_bound, node_arrays,
            tri_table, leaf_k, max_steps, interpret, sub, ordered,
            streams, fused, reduce_mode, any_hit, defer_attrs=True,
            block_leaf=block_leaf, fastpush=fastpush)
        if pad:
            t, bu, bv, tri = t[:n], bu[:n], bv[:n], tri[:n]
        # Attribute fetch for the winners: one row gather (misses index
        # the zero pad row — same zero normals/uv the fused kernel
        # produced for misses).
        n_tris = packed.attrs.shape[0] - 1
        safe = jnp.where(tri >= 0, tri, n_tris)
        rows = jnp.take(packed.attrs, safe, axis=0)
        bw = 1.0 - bu - bv
        nx = bw * rows[:, 0] + bu * rows[:, 3] + bv * rows[:, 6]
        ny = bw * rows[:, 1] + bu * rows[:, 4] + bv * rows[:, 7]
        nz = bw * rows[:, 2] + bu * rows[:, 5] + bv * rows[:, 8]
        u = bw * rows[:, 9] + bu * rows[:, 11] + bv * rows[:, 13]
        v = bw * rows[:, 10] + bu * rows[:, 12] + bv * rows[:, 14]
        # miss lanes carry bu=bv=0 -> bw=1 -> pad-row zeros, but force
        # exact zeros anyway so output doesn't depend on stale bu/bv
        hitm = tri >= 0
        zero = jnp.zeros_like(t)
        nx = jnp.where(hitm, nx, zero)
        ny = jnp.where(hitm, ny, zero)
        nz = jnp.where(hitm, nz, zero)
        u = jnp.where(hitm, u, zero)
        v = jnp.where(hitm, v, zero)
    else:
        t, nx, ny, nz, u, v, tri, steps = _traverse8(
            tuple(qo), tuple(qd), t_bound, node_arrays,
            packed.tris, leaf_k, max_steps, interpret, sub, ordered,
            streams, fused, reduce_mode, any_hit,
            block_leaf=block_leaf, fastpush=fastpush)
        if pad:
            t, nx, ny, nz = t[:n], nx[:n], ny[:n], nz[:n]
            u, v, tri = u[:n], v[:n], tri[:n]
    if return_steps:
        return t, (nx, ny, nz), u, v, tri, steps[:, 0, 0]
    return t, (nx, ny, nz), u, v, tri
