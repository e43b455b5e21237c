"""Multi-chip / multi-host sharding of the render pipeline.

The reference is single-process, single-GPU (device 0 hard-bound at
reference src/preview.cpp:107). The TPU-native scaling story (SURVEY §2.3,
§5.8) is pure data parallelism over pixels:

  * 1-D `Mesh(devices, ('data',))` — on a pod slice this spans ICI; with
    `jax.distributed.initialize` it extends across hosts over DCN;
  * the W×H wavefront's leading N dimension is sharded on 'data'
    (each chip owns a contiguous block of pixel rows);
  * scene tables (geoms / materials / BVH / textures) are KB–MB scale and
    replicated (the reference uploads them once per device too,
    src/pathtrace.cu:89-96);
  * the progressive accumulation image stays sharded on-device; it is only
    gathered to the host at save/preview cadence (the reference instead
    copies D2H every iteration, src/pathtrace.cu:389-390 — we don't);
  * for the differentiable path, per-material parameter gradients are
    partial sums per chip; GSPMD inserts the `psum` over 'data'
    automatically because the parameters are replicated.

No ring/Ulysses-style exchange exists because ray i never reads ray j
(SURVEY §5.7): the only collectives are the parameter-grad psum and the
save-time framebuffer all-gather.
"""
from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..render import integrator as integ
from ..scene import types as T
from ..utils import image as img_io


def init_distributed(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> None:
    """Multi-host bring-up (SURVEY §5.8): `jax.distributed.initialize` with
    explicit args for manual launches or no-args under a cluster
    environment (GKE/SLURM auto-detection). Call once per process before
    any jax op; afterwards `jax.devices()` spans the pod slice and
    `make_mesh()` builds the global data mesh (ICI intra-slice, DCN
    cross-host — XLA routes collectives)."""
    kwargs = {}
    if coordinator_address is not None:
        kwargs.update(coordinator_address=coordinator_address,
                      num_processes=num_processes, process_id=process_id)
    jax.distributed.initialize(**kwargs)


def make_mesh(num_devices: Optional[int] = None, devices=None) -> Mesh:
    """1-D data mesh over all (or the first `num_devices`) local+global
    devices. Call `jax.distributed.initialize()` first for multi-host."""
    devs = list(devices if devices is not None else jax.devices())
    if num_devices is not None:
        devs = devs[:num_devices]
    return Mesh(np.array(devs), ("data",))


def shard_scene(scene: T.Scene, mesh: Mesh) -> T.Scene:
    """Replicate all scene tables across the mesh (explicit placement so
    multi-host runs don't rely on implicit broadcasting)."""
    rep = NamedSharding(mesh, P())
    put = lambda tree: jax.tree_util.tree_map(
        lambda a: jax.device_put(a, rep), tree)
    return T.Scene(
        camera=scene.camera, settings=scene.settings,
        materials=put(scene.materials), geoms=put(scene.geoms),
        meshes=put(scene.meshes), textures=put(scene.textures),
        source_path=scene.source_path,
        packed_meshes=put(scene.packed_meshes),
    )


@partial(jax.jit, static_argnames=("cfg",), donate_argnames=("accum",))
def render_step_sharded(accum, materials, cam, geoms, meshes, textures, key,
                        cfg: integ.TraceConfig, packed_meshes=(),
                        iteration=None):
    """One sharded progressive iteration; `cfg.ray_sharding` carries the
    wavefront sharding and `accum` arrives sharded on its row dimension."""
    rad = integ.render_radiance(materials, cam, geoms, meshes, textures, key,
                                cfg, packed_meshes=packed_meshes,
                                iteration=iteration)
    return accum + rad


@partial(jax.jit, static_argnames=("cfg", "chunk"),
         donate_argnames=("accum",))
def render_chunk_sharded(accum, materials, cam, geoms, meshes, textures,
                         base_key, start_iter, cfg: integ.TraceConfig,
                         chunk, packed_meshes=()):
    """`chunk` sharded iterations in ONE SPMD program (lax.scan) — the
    multi-chip analogue of integrator.render_chunk: per-call dispatch over
    a remote-attached chip costs ~25 ms once any large program has run
    (BENCHMARKS.md "dispatch tax"), so progressive rendering scans
    iterations on device. Iteration i draws fold_in(base_key, start_iter
    + i), bitwise the stream step()-at-a-time draws."""
    def one(acc, i):
        key = jax.random.fold_in(base_key, start_iter + i)
        rad = integ.render_radiance(materials, cam, geoms, meshes, textures,
                                    key, cfg, packed_meshes=packed_meshes,
                                    iteration=start_iter + i)
        return acc + rad, None
    out, _ = jax.lax.scan(one, accum, jnp.arange(chunk, dtype=jnp.int32))
    return out


class ShardedRenderer:
    """Data-parallel progressive renderer over a device mesh.

    Equivalent public surface to `render.integrator.Renderer`, but the
    accumulator lives sharded across chips and every iteration runs SPMD.
    Requires H to be divisible by the mesh size (pad the scene resolution or
    pass a smaller mesh otherwise — path tracing has no cross-pixel
    dependencies, so any row partition is valid).
    """

    def __init__(self, scene: T.Scene, mesh: Optional[Mesh] = None,
                 settings: Optional[T.RenderSettings] = None):
        self.mesh = mesh or make_mesh()
        w, h = scene.camera.resolution
        ndev = self.mesh.devices.size
        if h % ndev != 0:
            raise ValueError(
                f"height {h} not divisible by mesh size {ndev}; "
                f"pad the resolution")
        self.scene = shard_scene(scene, self.mesh)
        self.settings = settings or scene.settings

        ray_sharding = NamedSharding(self.mesh, P("data"))
        self.accum_sharding = NamedSharding(self.mesh, P("data", None, None))
        types = np.asarray(scene.geoms.type)
        mesh_idx = tuple(int(i) for i in np.nonzero(types == T.MESH)[0])
        self.cfg = integ.TraceConfig(
            width=w, height=h,
            trace_depth=self.settings.trace_depth,
            antialias=self.settings.antialias,
            sort_materials=self.settings.sort_materials,
            compact=self.settings.compact,
            mesh_geom_indices=mesh_idx,
            ray_sharding=ray_sharding,
            geom_types=tuple(int(t) for t in types),
            mesh_ids=tuple(int(m) for m in np.asarray(scene.geoms.mesh_id)),
            sdf_kinds=scene.sdf_kinds,
            unroll=bool(len(mesh_idx) and scene.packed_meshes),
            tile=(32 if (len(mesh_idx) and scene.packed_meshes
                         and w % 32 == 0 and h % 32 == 0) else 0),
            glossy=bool(np.any(np.asarray(
                scene.materials.specular_exponent) > 0)),
            sky=bool(float(np.asarray(scene.textures.sky)[0]) > 0),
            bump=bool(np.any(np.asarray(scene.textures.bump)[:, 0] > 0)),
            nmap=bool(np.any(np.asarray(scene.textures.nrm_id) >= 0)),
            russian_roulette=self.settings.russian_roulette,
            stratified=getattr(self.settings, "stratified", False),
            strat_impl=getattr(self.settings, "strat_impl", "lattice"),
            dof=bool(scene.camera.aperture > 0
                     and scene.camera.focal_distance > 0),
            motion=bool(scene.camera.shutter > 0),
            dispersion=bool(
                scene.materials.dispersion is not None
                and np.any(np.asarray(scene.materials.dispersion) > 0)),
        )
        if getattr(self.settings, "nee", False):
            self.cfg = integ._wire_nee(self.scene, self.cfg)
        # Scene baking (see integrator.bake_tables): the tables become
        # replicated HLO constants under GSPMD; camera/accum/key stay
        # traced. Built after _wire_nee so env alias tables are included.
        self._baked_chunk = (self._build_baked_chunk()
                             if getattr(self.settings, "bake_scene", True)
                             else None)
        self.base_key = jax.random.key(self.settings.seed, impl=self.settings.rng)
        self.reset()

    def _build_baked_chunk(self):
        from functools import partial
        s = self.scene
        geoms_c, mats_c, tex_c = integ.bake_tables(s)
        cfg = self.cfg
        meshes, pm = s.meshes, s.packed_meshes

        @partial(jax.jit, static_argnames=("chunk",),
                 donate_argnames=("accum",))
        def baked(accum, cam, textures, base_key, start_iter, chunk):
            def one(acc, i):
                key = jax.random.fold_in(base_key, start_iter + i)
                return acc + integ.render_radiance(
                    mats_c, cam, geoms_c, meshes,
                    tex_c if tex_c is not None else textures, key, cfg,
                    packed_meshes=pm, iteration=start_iter + i), None
            out, _ = jax.lax.scan(one, accum,
                                  jnp.arange(chunk, dtype=jnp.int32))
            return out

        def run(accum, chunk):
            return baked(accum, s.camera.flat(),
                         jnp.zeros((0,)) if tex_c is not None
                         else s.textures,
                         self.base_key,
                         jnp.asarray(self.iteration, jnp.int32), chunk)
        return run

    def reset(self) -> None:
        w, h = self.scene.camera.resolution
        self.accum = jax.device_put(jnp.zeros((h, w, 3), jnp.float32),
                                    self.accum_sharding)
        self.iteration = 0

    def step(self) -> None:
        s = self.scene
        key = jax.random.fold_in(self.base_key, self.iteration)
        self.accum = render_step_sharded(
            self.accum, s.materials, s.camera.flat(), s.geoms, s.meshes,
            s.textures, key, self.cfg, s.packed_meshes,
            iteration=jnp.asarray(self.iteration, jnp.int32))
        self.iteration += 1

    # iterations per device program in step_many (see integrator.Renderer)
    CHUNK = 64

    def step_many(self, n: int) -> None:
        """Advance n iterations, scanning them in one SPMD program per
        chunk; bitwise-identical sample streams to n step() calls."""
        s = self.scene
        while n > 0:
            k = min(n, self.CHUNK)
            if self._baked_chunk is not None:
                self.accum = self._baked_chunk(self.accum, k)
            else:
                self.accum = render_chunk_sharded(
                    self.accum, s.materials, s.camera.flat(), s.geoms,
                    s.meshes, s.textures, self.base_key, self.iteration,
                    self.cfg, k, s.packed_meshes)
            self.iteration += k
            n -= k

    def render(self, num_iterations: int, seed: Optional[int] = None):
        if seed is not None:
            self.base_key = jax.random.key(
                seed, impl=self.settings.rng)
        self.step_many(num_iterations)
        self.accum.block_until_ready()
        return self.accum

    def image(self) -> np.ndarray:
        """Gather the sharded accumulator to the host and finalize
        (the save-time all-gather of SURVEY §5.8)."""
        gathered = jax.device_get(self.accum)
        return np.asarray(gathered)[:, ::-1, :] / max(self.iteration, 1)

    def save(self, path_base: Optional[str] = None, hdr: bool = False,
             denoise: bool = False) -> str:
        base = path_base or self.settings.image_name
        accum = np.asarray(jax.device_get(self.accum))
        if denoise:
            # Post-process on the gathered host image (the denoiser is a
            # save-time pass, not part of the SPMD loop).
            from ..render import denoise as dn
            normal, pos = dn.gbuffer(self.scene, self.cfg,
                                     self.scene.packed_meshes)
            it = max(self.iteration, 1)
            accum = np.asarray(dn.atrous_denoise(
                jnp.asarray(accum) / it, jax.device_get(normal),
                jax.device_get(pos))) * it
        return img_io.save_render(base, accum, self.iteration, hdr=hdr)
