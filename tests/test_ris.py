"""RIS direct lighting (--nee-ris): unbiasedness vs plain NEE and
variance reduction on a multi-light scene."""
import numpy as np
import pytest

from project3_cuda_path_tracer_tpu import load_scene
from project3_cuda_path_tracer_tpu.render import integrator as I
from project3_cuda_path_tracer_tpu.scene import types as T


@pytest.fixture(scope="module")
def lights_small():
    s = load_scene("scenes/lights.txt")
    s.camera.resolution = (32, 32)
    s.camera.derive()
    s.settings.trace_depth = 4
    return s


def render(scene, spp, **kw):
    st = T.RenderSettings(**{**scene.settings.__dict__, **kw})
    r = I.Renderer(scene, settings=st)
    r.render(spp)
    return r.image()


def test_ris_cfg_gate(lights_small):
    st = T.RenderSettings(**{**lights_small.settings.__dict__,
                             "nee": True, "nee_ris": 8})
    r = I.Renderer(lights_small, settings=st)
    assert r.cfg.nee_ris == 8 and r.cfg.nee


def test_ris_matches_nee_in_expectation(lights_small):
    """RIS re-weights which light sample gets the shadow ray; the
    estimator mean must match plain NEE (independent seeds)."""
    plain = render(lights_small, 64, nee=True, seed=3)
    ris = render(lights_small, 64, nee=True, nee_ris=8, seed=9)
    assert abs(float(plain.mean()) - float(ris.mean())) < 0.015
    # per-pixel agreement within MC noise
    assert float(np.abs(plain - ris).mean()) < 0.06


def test_ris_cuts_direct_light_variance(lights_small):
    """On the two-light scene RIS at M=8 must reduce RMSE vs plain NEE
    at equal spp (both against a high-spp ground truth)."""
    gt = render(lights_small, 512, nee=True, seed=1)

    def rmse(img):
        return float(np.sqrt(((img - gt) ** 2).mean()))

    e_plain = np.mean([rmse(render(lights_small, 12, nee=True, seed=s))
                       for s in (5, 7)])
    e_ris = np.mean([rmse(render(lights_small, 12, nee=True, nee_ris=8,
                                 seed=s)) for s in (5, 7)])
    assert e_ris < e_plain


def test_ris_pure_glossy_not_starved(tmp_path):
    """A REFL=1 glossy material has zero diffuse target; the glossy floor
    in the RIS target must keep its direct light alive (vs plain NEE)."""
    f = tmp_path / "glossy.txt"
    f.write_text("""MATERIAL 0
RGB 1 1 1
EMITTANCE 4

MATERIAL 1
RGB 0 0 0
SPECEX 32
SPECRGB .9 .9 .9
REFL 1

CAMERA
RES 24 24
FOVY 45
ITERATIONS 8
DEPTH 3
FILE g
EYE 0 2 6
LOOKAT 0 2 0
UP 0 1 0

OBJECT 0
cube
material 0
TRANS 0 6 0
ROTAT 0 0 0
SCALE 2 .2 2

OBJECT 1
cube
material 1
TRANS 0 0 0
ROTAT 0 0 0
SCALE 8 .1 8
""")
    s = load_scene(str(f))
    plain = render(s, 96, nee=True, seed=3)
    ris = render(s, 96, nee=True, nee_ris=4, seed=9)
    # glossy floor keeps energy: means agree within MC noise
    assert abs(float(plain.mean()) - float(ris.mean())) \
        < 0.1 * max(float(plain.mean()), 1e-6) + 0.01
