"""Multi-mesh scenes: pack_all's per-mesh rebasing (local node/tri indices)
must agree with the concatenated-bundle XLA walk."""
import numpy as np
import pytest

from project3_cuda_path_tracer_tpu import load_scene
from project3_cuda_path_tracer_tpu.render.integrator import Renderer


@pytest.fixture(scope="module")
def two_mesh_scene(tmp_path_factory):
    d = tmp_path_factory.mktemp("mm")
    scene = d / "two.txt"
    import os
    meshes = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "scenes", "meshes")
    if not os.path.exists(os.path.join(meshes, "torus.obj")):
        pytest.skip("generated meshes absent")
    # second, distinct OBJ so the bundle really holds two meshes
    cube_obj = d / "cube.obj"
    cube_obj.write_text("""v -1 -1 -1
v 1 -1 -1
v 1 1 -1
v -1 1 -1
v -1 -1 1
v 1 -1 1
v 1 1 1
v -1 1 1
f 1 3 2
f 1 4 3
f 5 6 7
f 5 7 8
f 1 2 6
f 1 6 5
f 2 3 7
f 2 7 6
f 3 4 8
f 3 8 7
f 4 1 5
f 4 5 8
""")
    scene.write_text(f"""MATERIAL 0
RGB 1 1 1
EMITTANCE 4

MATERIAL 1
RGB .8 .4 .3

MATERIAL 2
RGB .3 .5 .8

CAMERA
RES 32 32
FOVY 45
ITERATIONS 8
DEPTH 3
FILE two
EYE 0 2 8
LOOKAT 0 1 0
UP 0 1 0

OBJECT 0
cube
material 0
TRANS 0 6 0
ROTAT 0 0 0
SCALE 4 .3 4

OBJECT 1
mesh {meshes}/torus.obj
material 1
TRANS -1.5 1 0
ROTAT 20 0 0
SCALE 1 1 1

OBJECT 2
mesh {cube_obj}
material 2
TRANS 1.5 1 0
ROTAT 0 30 0
SCALE 0.8 0.8 0.8
""")
    return str(scene)


def test_two_meshes_packet_equals_xla(two_mesh_scene):
    s = load_scene(two_mesh_scene)
    assert len(s.packed_meshes) == 2  # two DISTINCT meshes in the bundle
    r1 = Renderer(s)
    r1.render(3, seed=2)
    img_packet = r1.image()

    s.packed_meshes = ()
    r2 = Renderer(s)
    r2.render(3, seed=2)
    img_xla = r2.image()
    np.testing.assert_allclose(img_packet, img_xla, atol=1e-5)
    # both torus materials visible
    assert img_packet.mean() > 0.01
