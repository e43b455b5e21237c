"""Megakernel parity tests (ops/megakernel.py).

The fused Pallas megakernel bakes the scene into the instruction stream and
draws its uniforms from the on-core PRNG — which returns zeros under Pallas
interpret mode on CPU, so a naive interpret-mode run cannot validate the
sampling paths. The kernel therefore has a test-only `inject_uniforms` mode
(run_interpret_with_uniforms): the per-bounce uniforms arrive as a kernel
input and the SAME stream is fed to the parity-tested planar-jnp pipeline
(ops/wavefront.py), giving an exact one-iteration comparison of the whole
kernel body — intersection merge over baked geoms, material chains,
emissive/miss termination, lobe selection, cosine-hemisphere / mirror /
Fresnel-refraction scattering, throughput division by lobe probability.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from project3_cuda_path_tracer_tpu import load_scene
from project3_cuda_path_tracer_tpu.ops import megakernel as MK
from project3_cuda_path_tracer_tpu.ops import wavefront as wf
from project3_cuda_path_tracer_tpu.ops.vec import V3
from project3_cuda_path_tracer_tpu.scene import types as T


def planar_oracle(scene, width, height, depth, uniforms):
    """One iteration of the planar-jnp pipeline with the injected uniform
    stream (the same loop as render.integrator.trace_wavefront, AA off)."""
    n = width * height
    cam = scene.camera.flat()
    geom_types = tuple(int(t) for t in np.asarray(scene.geoms.type))
    mesh_ids = tuple(int(m) for m in np.asarray(scene.geoms.mesh_id))
    o, d, times, pix = wf.generate_rays_planar(
        cam, width, height, jax.random.PRNGKey(0), antialias=False, tile=0)
    thr = V3(*(jnp.ones((n,), jnp.float32) for _ in range(3)))
    alive = jnp.ones((n,), bool)
    rad = V3(*(jnp.zeros((n,), jnp.float32) for _ in range(3)))
    no = jnp.zeros((n,), bool)
    for b in range(depth):
        hit = wf.intersect_planar(o, d, times, scene.geoms, scene.meshes,
                                  geom_types, scene.packed_meshes, mesh_ids)
        out = wf.shade_planar(hit, d, thr, alive, scene.materials,
                              scene.textures, jnp.asarray(uniforms[b]),
                              last_bounce=no, glossy=False, sky=False)
        rad = rad + out.radiance
        o, d = out.origin, out.direction
        thr, alive = out.throughput, out.alive
    return tuple(np.asarray(c) for c in rad)


def _compare(scene_path, res, depth, seed, atol=1e-4, mismatch_frac=0.01,
             mean_tol=0.05):
    """The kernel and the oracle are two separately compiled programs, so
    ulp-level float differences (fma contraction, rsqrt scheduling) are
    expected; near decision thresholds (tangent-frame axis pick at
    SQRT_OF_ONE_THIRD, nearest-hit ties) they flip a binary choice and the
    lane diverges wholesale. The contract is therefore: the overwhelming
    majority of lanes agree to float tolerance, the divergent fraction is
    tiny, and the image means agree."""
    scene = load_scene(scene_path)
    scene.camera.resolution = (res, res)
    scene.camera.derive()
    n = res * res
    rng = np.random.default_rng(seed)
    uniforms = rng.random((depth, 4, n), dtype=np.float32)

    got = MK.run_interpret_with_uniforms(scene, res, res, depth, uniforms)
    want = planar_oracle(scene, res, res, depth, uniforms)
    for g, w in zip(got, want):
        bad = int((np.abs(g - w) > atol).sum())
        assert bad <= mismatch_frac * n, f"{bad}/{n} lanes disagree"
        assert abs(g.mean() - w.mean()) < mean_tol, \
            f"means diverge: {g.mean():.4f} vs {w.mean():.4f}"


def test_megakernel_matches_planar_cornell():
    """Diffuse + emissive + mirror over 3 bounces."""
    _compare("/root/reference/scenes/cornell.txt", 32, 3, seed=1)


def test_megakernel_matches_planar_sphere():
    _compare("/root/reference/scenes/sphere.txt", 16, 2, seed=2)


def test_megakernel_matches_planar_glass():
    """Fresnel-refractive sphere adds the transmit path. On top of the
    threshold flips above, the kernel and the planar path pick the
    transmitted-ray origin differently by design (backed-off vs exact
    surface point, both valid, ~1e-4 ray offset)."""
    _compare("scenes/cornell_glass.txt", 24, 4, seed=3, atol=2e-4,
             mismatch_frac=0.02)


def test_megakernel_hardware_path_builds():
    """The production (PRNG) kernel builds and its spec is jit-hashable."""
    scene = load_scene("/root/reference/scenes/cornell.txt")
    scene.camera.resolution = (16, 16)
    scene.camera.derive()
    r = MK.MegakernelRenderer(scene)
    assert r.spec == r.spec and hash(r.spec) == hash(r.spec)
    kernel, grid, n_pad = r.spec.build()
    assert callable(kernel) and grid >= 1 and n_pad >= 256


def test_supports_gating():
    assert MK.supports(load_scene("/root/reference/scenes/cornell.txt"))
    mesh_scene = load_scene("scenes/mesh.txt")
    assert not MK.supports(mesh_scene)
