"""Pallas packet BVH traversal — the TPU-native mesh intersector.

Why not the XLA while-loop traversal (ops/intersect.bvh_traverse)? Per-lane
cursors require per-lane *gathers* of node/triangle data every step, and
element gathers are the slowest operation on a TPU VPU — the 81920-tri
benchmark mesh doesn't finish one 1M-ray iteration in minutes.

TPU-native design (the SIMD analog of classic packet tracing):

  * rays are processed in PACKETS of 8x128 = 1024 (one vector tile);
  * each packet walks the skip-pointer tree with ONE shared scalar cursor
    (a `lax.while_loop` over a scalar — no per-lane state);
  * node data is packed one-node-per-row, resident in VMEM, so visiting a
    node is a single dynamic ROW load (scalar index — cheap), then the AABB
    test runs vectorized across all 1024 lanes;
  * the packet descends if ANY lane's AABB test passes (vector -> scalar
    reduction), else takes the escape pointer — divergence costs visiting
    the union of the packet's nodes, which is why the integrator keeps
    packets coherent (tile-swizzled primary rays; sorted bounce rays);
  * leaves load LEAF_K triangle rows ([T, 24] f32: v0, e1, e2, n0, n1, n2,
    uv0, uv1, uv2) and run Moller-Trumbore vectorized across the packet;
    the winning hit's smooth normal and uv are interpolated IN-KERNEL from
    the loaded rows, so no post-traversal gathers are needed at all.

Fills the reference's mesh TODO (src/pathtrace.cu:188) at production speed;
`scene.types.MeshBundle` stays the source format — `pack_mesh` converts.
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
from .intersect import LEAF_K

SUB = 8
LANES = 128
PACKET = SUB * LANES  # 1024 rays
BIG = 1e30
TRI_ROW = 24          # v0(3) e1(3) e2(3) n0(3) n1(3) n2(3) uv0(2) uv1(2) uv2(2)
VMEM_BUDGET = 12 * 1024 * 1024


class PackedMesh(NamedTuple):
    """VMEM-friendly single mesh (indices LOCAL, root node = 0):
    nodes_f [B,8] f32 = lo.xyz, hi.xyz, pad2;
    nodes_i [B,8] i32 = skip, meta, pad6 where meta = start*16 + count for
    leaves (count <= LEAF_K <= 15) and -1 for internal nodes;
    tris [T_pad, TRI_ROW] f32.
    A pytree (all-leaf NamedTuple), so it flows through jit as an argument.
    """
    nodes_f: jnp.ndarray
    nodes_i: jnp.ndarray
    tris: jnp.ndarray

    @property
    def vmem_bytes(self) -> int:
        return 4 * (self.nodes_f.size + self.nodes_i.size + self.tris.size)


def fits_vmem(packed: "PackedMesh") -> bool:
    return packed.vmem_bytes <= VMEM_BUDGET


def pack_mesh(meshes: T.MeshBundle, mesh_index: int = 0) -> PackedMesh:
    """Extract + rebase one mesh from the concatenated bundle so its local
    root is node 0."""
    roots = np.asarray(meshes.mesh_root, np.int64)
    tri_offs = np.asarray(meshes.mesh_tri_offset, np.int64)
    b_total = np.asarray(meshes.node_lo).shape[0]
    t_total = np.asarray(meshes.tri_v0).shape[0]
    n0 = int(roots[mesh_index])
    n1 = int(roots[mesh_index + 1]) if mesh_index + 1 < len(roots) else b_total
    t0 = int(tri_offs[mesh_index])
    t1 = (int(tri_offs[mesh_index + 1]) if mesh_index + 1 < len(tri_offs)
          else t_total)

    nlo = np.asarray(meshes.node_lo, np.float32)[n0:n1]
    nhi = np.asarray(meshes.node_hi, np.float32)[n0:n1]
    start = np.asarray(meshes.node_start, np.int64)[n0:n1]
    count = np.asarray(meshes.node_count, np.int64)[n0:n1]
    skip = np.asarray(meshes.node_skip, np.int32)[n0:n1]
    skip = np.where(skip >= 0, skip - n0, -1).astype(np.int32)
    start_local = np.where(count > 0, start - t0, -1)
    b = nlo.shape[0]

    assert count.max() <= 15, "meta encoding holds counts <= 15"
    meta = np.where(count > 0, start_local * 16 + count, -1).astype(np.int32)
    nodes_f = np.zeros((b, 8), np.float32)
    nodes_f[:, 0:3] = nlo
    nodes_f[:, 3:6] = nhi
    nodes_i = np.zeros((b, 8), np.int32)
    nodes_i[:, 0] = skip
    nodes_i[:, 1] = meta

    t = t1 - t0
    sl = slice(t0, t1)
    tris = np.zeros((t + 1, TRI_ROW), np.float32)  # +1 degenerate pad row
    tris[:t, 0:3] = np.asarray(meshes.tri_v0, np.float32)[sl]
    tris[:t, 3:6] = np.asarray(meshes.tri_e1, np.float32)[sl]
    tris[:t, 6:9] = np.asarray(meshes.tri_e2, np.float32)[sl]
    tris[:t, 9:12] = np.asarray(meshes.tri_n0, np.float32)[sl]
    tris[:t, 12:15] = np.asarray(meshes.tri_n1, np.float32)[sl]
    tris[:t, 15:18] = np.asarray(meshes.tri_n2, np.float32)[sl]
    tris[:t, 18:20] = np.asarray(meshes.tri_uv0, np.float32)[sl]
    tris[:t, 20:22] = np.asarray(meshes.tri_uv1, np.float32)[sl]
    tris[:t, 22:24] = np.asarray(meshes.tri_uv2, np.float32)[sl]

    return PackedMesh(nodes_f=jnp.asarray(nodes_f),
                      nodes_i=jnp.asarray(nodes_i),
                      tris=jnp.asarray(tris))


def pack_all(meshes: T.MeshBundle):
    """One PackedMesh per mesh in the bundle (empty tuple for no meshes)."""
    k = int(np.asarray(meshes.mesh_root).shape[0])
    if int(np.asarray(meshes.tri_v0).shape[0]) <= 1:
        return ()
    return tuple(pack_mesh(meshes, i) for i in range(k))


def _traverse_kernel(leaf_k: int, root: int, max_steps: int):
    """Kernel body. Outputs per-ray: t, nx, ny, nz, u, v, hit-mask(int)."""

    def kernel(qox_ref, qoy_ref, qoz_ref, qdx_ref, qdy_ref, qdz_ref,
               tmax_ref, nodes_f_ref, nodes_i_ref, tris_ref,
               t_ref, nx_ref, ny_ref, nz_ref, u_ref, v_ref, tri_ref):
        qox, qoy, qoz = qox_ref[:], qoy_ref[:], qoz_ref[:]
        qdx, qdy, qdz = qdx_ref[:], qdy_ref[:], qdz_ref[:]
        idx = 1.0 / qdx
        idy = 1.0 / qdy
        idz = 1.0 / qdz

        shape = (SUB, LANES)
        zero = jnp.zeros(shape, jnp.float32)
        # occlusion bound: lanes whose nearest PRIMITIVE hit is closer than
        # a subtree's entry never descend it — the per-ray t_best starts at
        # the caller-provided (object-space) bound instead of +inf
        init = (jnp.int32(root), jnp.int32(0),
                tmax_ref[:],
                zero, zero, zero, zero, zero,
                jnp.full(shape, -1, jnp.int32))

        def cond(state):
            cur, step = state[0], state[1]
            return (cur >= 0) & (step < max_steps)

        def one_node(cur, active, t_best, nx, ny, nz, uu, vv, tri):
            """Visit node `cur` (masked by scalar `active`); returns the next
            cursor and the updated hit state."""
            safe = jnp.maximum(cur, 0)
            row = nodes_f_ref[safe]       # [8] scalar row load
            lox, loy, loz = row[0], row[1], row[2]
            hix, hiy, hiz = row[3], row[4], row[5]
            skip = nodes_i_ref[safe, 0]
            meta = nodes_i_ref[safe, 1]

            t1x = (lox - qox) * idx
            t2x = (hix - qox) * idx
            t1y = (loy - qoy) * idy
            t2y = (hiy - qoy) * idy
            t1z = (loz - qoz) * idz
            t2z = (hiz - qoz) * idz
            tmin = jnp.maximum(jnp.minimum(t1x, t2x),
                               jnp.maximum(jnp.minimum(t1y, t2y),
                                           jnp.minimum(t1z, t2z)))
            tmax = jnp.minimum(jnp.maximum(t1x, t2x),
                               jnp.minimum(jnp.maximum(t1y, t2y),
                                           jnp.maximum(t1z, t2z)))
            # `t_best > 0` deadens sentinel lanes (t_bound <= 0: pads and
            # terminated paths) exactly — see ops/bvh8.py.
            lane_hit = ((tmax >= tmin) & (tmax > 0) & (tmin < t_best)
                        & (t_best > 0))
            any_hit = jnp.any(lane_hit) & active
            is_leaf = meta >= 0

            def do_leaf(args):
                t_best, nx, ny, nz, uu, vv, tri = args
                start = meta // 16
                count = meta - start * 16
                for k in range(leaf_k):
                    r = tris_ref[start + k]
                    in_leaf = k < count
                    v0x, v0y, v0z = r[0], r[1], r[2]
                    e1x, e1y, e1z = r[3], r[4], r[5]
                    e2x, e2y, e2z = r[6], r[7], r[8]
                    pvx = qdy * e2z - qdz * e2y
                    pvy = qdz * e2x - qdx * e2z
                    pvz = qdx * e2y - qdy * e2x
                    det = e1x * pvx + e1y * pvy + e1z * pvz
                    ok_det = jnp.abs(det) > 1e-12
                    inv_det = jnp.where(ok_det, 1.0 / det, 0.0)
                    tvx = qox - v0x
                    tvy = qoy - v0y
                    tvz = qoz - v0z
                    bu = (tvx * pvx + tvy * pvy + tvz * pvz) * inv_det
                    qvx = tvy * e1z - tvz * e1y
                    qvy = tvz * e1x - tvx * e1z
                    qvz = tvx * e1y - tvy * e1x
                    bv = (qdx * qvx + qdy * qvy + qdz * qvz) * inv_det
                    t_k = (e2x * qvx + e2y * qvy + e2z * qvz) * inv_det
                    hit_k = (ok_det & (bu >= 0) & (bv >= 0)
                             & (bu + bv <= 1) & (t_k > 1e-6)
                             & (t_k < t_best) & in_leaf)
                    bw = 1.0 - bu - bv
                    # smooth normal + uv interpolated from the loaded row
                    nkx = bw * r[9] + bu * r[12] + bv * r[15]
                    nky = bw * r[10] + bu * r[13] + bv * r[16]
                    nkz = bw * r[11] + bu * r[14] + bv * r[17]
                    uk = bw * r[18] + bu * r[20] + bv * r[22]
                    vk = bw * r[19] + bu * r[21] + bv * r[23]
                    t_best = jnp.where(hit_k, t_k, t_best)
                    nx = jnp.where(hit_k, nkx, nx)
                    ny = jnp.where(hit_k, nky, ny)
                    nz = jnp.where(hit_k, nkz, nz)
                    uu = jnp.where(hit_k, uk, uu)
                    vv = jnp.where(hit_k, vk, vv)
                    tri = jnp.where(hit_k, start + k, tri)
                return t_best, nx, ny, nz, uu, vv, tri

            t_best, nx, ny, nz, uu, vv, tri = jax.lax.cond(
                any_hit & is_leaf, do_leaf, lambda a: a,
                (t_best, nx, ny, nz, uu, vv, tri))

            nxt = jnp.where(any_hit & ~is_leaf, cur + 1, skip)
            nxt = jnp.where(active, nxt, cur)
            return nxt, t_best, nx, ny, nz, uu, vv, tri

        def body(state):
            cur, step, t_best, nx, ny, nz, uu, vv, tri = state
            # (a 2-nodes-per-iteration unroll was measured neutral: the cost
            # is vector work x union size, not loop overhead)
            cur, t_best, nx, ny, nz, uu, vv, tri = one_node(
                cur, cur >= 0, t_best, nx, ny, nz, uu, vv, tri)
            return cur, step + 1, t_best, nx, ny, nz, uu, vv, tri

        out = jax.lax.while_loop(cond, body, init)
        _, _, t_best, nx, ny, nz, uu, vv, tri = out
        t_ref[:] = t_best
        nx_ref[:] = nx
        ny_ref[:] = ny
        nz_ref[:] = nz
        u_ref[:] = uu
        v_ref[:] = vv
        tri_ref[:] = tri

    return kernel


@functools.partial(jax.jit,
                   static_argnames=("leaf_k", "max_steps", "interpret",
                                    "sub"))
def _traverse(qo_planes, qd_planes, t_bound, nodes_f, nodes_i, tris,
              leaf_k, max_steps, interpret, sub=False):
    n = qo_planes[0].shape[0]
    assert n % PACKET == 0
    rows = n // LANES
    grid = n // PACKET

    def as2d(a):
        return a.reshape(rows, LANES)

    block = pl.BlockSpec((SUB, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    plane_f = jax.ShapeDtypeStruct((rows, LANES), jnp.float32)
    plane_i = jax.ShapeDtypeStruct((rows, LANES), jnp.int32)

    kernel = (_traverse_kernel_sub(leaf_k, 0, max_steps) if sub
              else _traverse_kernel(leaf_k, 0, max_steps))
    # vmem_limit_bytes raises the compiler's default 16MB scoped-VMEM budget
    # (physical VMEM is far larger on v5e+): the whole packed mesh lives in
    # VMEM and XLA additionally stages the ray operands there when the call
    # sits inside a larger program.
    outs = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[block] * 7 + [full, full, full],
        out_specs=(block,) * 7,
        out_shape=(plane_f, plane_f, plane_f, plane_f, plane_f, plane_f,
                   plane_i),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*(as2d(p) for p in qo_planes), *(as2d(p) for p in qd_planes),
      as2d(t_bound), nodes_f, nodes_i, tris)
    return tuple(o.reshape(-1) for o in outs)


def traverse_packets(qo, qd, packed: PackedMesh, leaf_k: int = LEAF_K,
                     max_steps: int = 2 ** 20, t_bound=None,
                     sub_packets: bool = False):
    """Nearest-hit over the packed mesh for planar object-space rays.

    qo, qd: tuples of [N] planes (padded internally to a packet multiple).
    `t_bound` [N] (object space) is the occlusion bound — subtrees beyond
    the ray's best-known primitive hit are pruned; None means unbounded.
    Returns (t_obj [N], normal_obj (nx,ny,nz) [N] each, u [N], v [N],
    tri [N] int32 with -1 = miss, where "miss" includes "nothing closer
    than t_bound"). u/v are interpolated TEXTURE coordinates; normals are
    the smooth interpolated object-space normals (unnormalized).
    """
    n = qo[0].shape[0]
    if t_bound is None:
        t_bound = jnp.full((n,), BIG, jnp.float32)
    pad = (-n) % PACKET
    if pad:
        padp = lambda a, val: jnp.concatenate(
            [a, jnp.full((pad,), val, a.dtype)])
        qo = tuple(padp(c, 0.0) for c in qo)
        qd = tuple(padp(c, 1.0) for c in qd)
        t_bound = jnp.concatenate(
            [t_bound, jnp.full((pad,), -1.0, jnp.float32)])
    interpret = jax.default_backend() == "cpu"
    t, nx, ny, nz, u, v, tri = _traverse(
        tuple(qo), tuple(qd), t_bound, packed.nodes_f, packed.nodes_i,
        packed.tris, leaf_k, max_steps, interpret, sub_packets)
    if pad:
        t, nx, ny, nz = t[:n], nx[:n], ny[:n], nz[:n]
        u, v, tri = u[:n], v[:n], tri[:n]
    return t, (nx, ny, nz), u, v, tri


# ---------------------------------------------------------------------------
# Sub-packet traversal: 8 independent cursors, one per sublane row.
# Incoherent wavefronts make a single shared cursor visit the union of 1024
# rays' node sets; giving each 128-lane row its own cursor shrinks the
# per-row union ~5x (measured by simulation).
#
# MEASURED RESULT on v5e: despite the smaller unions, this variant is far
# SLOWER than the shared cursor — the per-step cost (8 scalar row loads,
# an 8-scalar carried cursor chain, per-row masked leaf phase with up to
# leaf_k*8 scalar loads) dwarfs the union savings in Mosaic's lowering.
# Kept as a documented experiment (sub_packets=True), not the default.
# ---------------------------------------------------------------------------

def _traverse_kernel_sub(leaf_k: int, root: int, max_steps: int):
    def kernel(qox_ref, qoy_ref, qoz_ref, qdx_ref, qdy_ref, qdz_ref,
               tmax_ref, nodes_f_ref, nodes_i_ref, tris_ref,
               t_ref, nx_ref, ny_ref, nz_ref, u_ref, v_ref, tri_ref):
        qox, qoy, qoz = qox_ref[:], qoy_ref[:], qoz_ref[:]
        qdx, qdy, qdz = qdx_ref[:], qdy_ref[:], qdz_ref[:]
        idx = 1.0 / qdx
        idy = 1.0 / qdy
        idz = 1.0 / qdz

        shape = (SUB, LANES)
        zero = jnp.zeros(shape, jnp.float32)
        cursors0 = tuple(jnp.int32(root) for _ in range(SUB))
        init = cursors0 + (jnp.int32(0),
                           tmax_ref[:],
                           zero, zero, zero, zero, zero,
                           jnp.full(shape, -1, jnp.int32))

        def cond(state):
            alive = state[0] >= 0
            for r in range(1, SUB):
                alive = alive | (state[r] >= 0)
            return alive & (state[SUB] < max_steps)

        def body(state):
            cursors = state[:SUB]
            step = state[SUB]
            t_best, nx, ny, nz, uu, vv, tri = state[SUB + 1:]

            safe = [jnp.maximum(c, 0) for c in cursors]
            rows_f = [nodes_f_ref[s] for s in safe]
            skips = [nodes_i_ref[s, 0] for s in safe]
            metas = [nodes_i_ref[s, 1] for s in safe]

            def col(vals):
                return jnp.stack(vals).reshape(SUB, 1)

            lox = col([r[0] for r in rows_f])
            loy = col([r[1] for r in rows_f])
            loz = col([r[2] for r in rows_f])
            hix = col([r[3] for r in rows_f])
            hiy = col([r[4] for r in rows_f])
            hiz = col([r[5] for r in rows_f])
            active = col([(c >= 0).astype(jnp.float32) for c in cursors]) > 0

            t1x = (lox - qox) * idx
            t2x = (hix - qox) * idx
            t1y = (loy - qoy) * idy
            t2y = (hiy - qoy) * idy
            t1z = (loz - qoz) * idz
            t2z = (hiz - qoz) * idz
            tmin = jnp.maximum(jnp.minimum(t1x, t2x),
                               jnp.maximum(jnp.minimum(t1y, t2y),
                                           jnp.minimum(t1z, t2z)))
            tmax = jnp.minimum(jnp.maximum(t1x, t2x),
                               jnp.minimum(jnp.maximum(t1y, t2y),
                                           jnp.maximum(t1z, t2z)))
            lane_hit = ((tmax >= tmin) & (tmax > 0) & (tmin < t_best)
                        & (t_best > 0) & active)
            # int32 row-wise any: Mosaic cannot extract scalar bools
            row_hit_i = jnp.max(lane_hit.astype(jnp.int32), axis=1,
                                keepdims=True)           # (SUB,1) int32
            row_hit = row_hit_i > 0

            is_leaf = col([(m >= 0).astype(jnp.float32) for m in metas]) > 0
            do_leaf = row_hit & is_leaf

            starts = [jnp.maximum(m, 0) // 16 for m in metas]
            counts = [jnp.maximum(m, 0) - (jnp.maximum(m, 0) // 16) * 16
                      for m in metas]
            counts_col = col(counts).astype(jnp.float32)

            for k in range(leaf_k):
                rows_t = [tris_ref[s + k] for s in starts]
                v0x = col([r[0] for r in rows_t])
                v0y = col([r[1] for r in rows_t])
                v0z = col([r[2] for r in rows_t])
                e1x = col([r[3] for r in rows_t])
                e1y = col([r[4] for r in rows_t])
                e1z = col([r[5] for r in rows_t])
                e2x = col([r[6] for r in rows_t])
                e2y = col([r[7] for r in rows_t])
                e2z = col([r[8] for r in rows_t])
                in_leaf = counts_col > k

                pvx = qdy * e2z - qdz * e2y
                pvy = qdz * e2x - qdx * e2z
                pvz = qdx * e2y - qdy * e2x
                det = e1x * pvx + e1y * pvy + e1z * pvz
                ok_det = jnp.abs(det) > 1e-12
                inv_det = jnp.where(ok_det, 1.0 / det, 0.0)
                tvx = qox - v0x
                tvy = qoy - v0y
                tvz = qoz - v0z
                bu = (tvx * pvx + tvy * pvy + tvz * pvz) * inv_det
                qvx = tvy * e1z - tvz * e1y
                qvy = tvz * e1x - tvx * e1z
                qvz = tvx * e1y - tvy * e1x
                bv = (qdx * qvx + qdy * qvy + qdz * qvz) * inv_det
                t_k = (e2x * qvx + e2y * qvy + e2z * qvz) * inv_det
                hit_k = (ok_det & (bu >= 0) & (bv >= 0) & (bu + bv <= 1)
                         & (t_k > 1e-6) & (t_k < t_best) & in_leaf
                         & do_leaf)
                bw = 1.0 - bu - bv
                nkx = bw * col([r[9] for r in rows_t]) \
                    + bu * col([r[12] for r in rows_t]) \
                    + bv * col([r[15] for r in rows_t])
                nky = bw * col([r[10] for r in rows_t]) \
                    + bu * col([r[13] for r in rows_t]) \
                    + bv * col([r[16] for r in rows_t])
                nkz = bw * col([r[11] for r in rows_t]) \
                    + bu * col([r[14] for r in rows_t]) \
                    + bv * col([r[17] for r in rows_t])
                uk = bw * col([r[18] for r in rows_t]) \
                    + bu * col([r[20] for r in rows_t]) \
                    + bv * col([r[22] for r in rows_t])
                vk = bw * col([r[19] for r in rows_t]) \
                    + bu * col([r[21] for r in rows_t]) \
                    + bv * col([r[23] for r in rows_t])
                tri_ids = col([s + k for s in starts])
                t_best = jnp.where(hit_k, t_k, t_best)
                nx = jnp.where(hit_k, nkx, nx)
                ny = jnp.where(hit_k, nky, ny)
                nz = jnp.where(hit_k, nkz, nz)
                uu = jnp.where(hit_k, uk, uu)
                vv = jnp.where(hit_k, vk, vv)
                tri = jnp.where(hit_k, tri_ids, tri)

            new_cursors = []
            for r in range(SUB):
                rh = row_hit_i[r, 0] > 0      # scalar int32 -> scalar bool
                il = metas[r] >= 0            # scalar compare
                nxt = jnp.where(rh & ~il, cursors[r] + 1, skips[r])
                new_cursors.append(
                    jnp.where(cursors[r] >= 0, nxt, jnp.int32(-1)))

            return tuple(new_cursors) + (step + 1, t_best, nx, ny, nz,
                                         uu, vv, tri)

        out = jax.lax.while_loop(cond, body, init)
        t_best, nx, ny, nz, uu, vv, tri = out[SUB + 1:]
        t_ref[:] = t_best
        nx_ref[:] = nx
        ny_ref[:] = ny
        nz_ref[:] = nz
        u_ref[:] = uu
        v_ref[:] = vv
        tri_ref[:] = tri

    return kernel
