"""End-to-end CLI runs (app/cli.py:main).

The reference's whole user surface is main() (reference: src/main.cpp:33-146):
parse scene, progressive render to the iteration budget, save, exit. These
tests execute our main() on a tiny scene and assert the save/checkpoint/
resume contracts — in particular that an interrupted-and-resumed render is
bit-identical to an uninterrupted one (same RNG stream after resume).
"""
import os

import numpy as np
import pytest

from project3_cuda_path_tracer_tpu.app.cli import main
from project3_cuda_path_tracer_tpu.utils.image import read_png

TINY_SCENE = """\
// emissive sphere over a diffuse floor (tiny e2e config)
MATERIAL 0
RGB         1 1 1
SPECEX      0
SPECRGB     0 0 0
REFL        0
REFR        0
REFRIOR     0
EMITTANCE   5

MATERIAL 1
RGB         .8 .4 .3
SPECEX      0
SPECRGB     0 0 0
REFL        0
REFR        0
REFRIOR     0
EMITTANCE   0

CAMERA
RES         16 16
FOVY        45
ITERATIONS  4
DEPTH       3
FILE        tiny
EYE         0.0 2 6
LOOKAT      0 2 0
UP          0 1 0

OBJECT 0
sphere
material 0
TRANS       0 4 0
ROTAT       0 0 0
SCALE       2 2 2

OBJECT 1
cube
material 1
TRANS       0 -1 0
ROTAT       0 0 0
SCALE       10 1 10
"""


@pytest.fixture()
def tiny_scene(tmp_path):
    p = tmp_path / "tiny.txt"
    p.write_text(TINY_SCENE)
    return str(p)


def test_main_renders_and_saves(tiny_scene, tmp_path):
    rc = main([tiny_scene, "--outdir", str(tmp_path), "--out", "a",
               "--iterations", "2"])
    assert rc == 0
    out = tmp_path / "a.png"
    assert out.exists()
    im = read_png(str(out))
    assert im.shape == (16, 16, 3)
    assert im.max() > 0  # the light is visible


def test_feature_drop_summary_line(tiny_scene, tmp_path, capsys):
    """Requested-but-dropped features are announced in ONE stderr line at
    renderer construction (integrator.announce_drops) — the flag surface
    must never narrow silently."""
    rc = main([tiny_scene, "--outdir", str(tmp_path), "--out", "d",
               "--iterations", "1", "--nee", "--sort"])
    assert rc == 0
    err = capsys.readouterr().err
    assert "features dropped:" in err
    assert "nee (incompatible with sort/compact)" in err
    # ...and a clean run prints no drop line
    rc = main([tiny_scene, "--outdir", str(tmp_path), "--out", "d2",
               "--iterations", "1", "--nee"])
    assert rc == 0
    assert "features dropped:" not in capsys.readouterr().err


def test_main_hdr_and_snapshots(tiny_scene, tmp_path):
    rc = main([tiny_scene, "--outdir", str(tmp_path), "--out", "b",
               "--iterations", "2", "--hdr", "--snapshot-every", "1"])
    assert rc == 0
    assert (tmp_path / "b.hdr").exists()
    assert (tmp_path / "b.snap1.png").exists()
    assert (tmp_path / "b.snap2.png").exists()


def test_resume_is_stream_identical(tiny_scene, tmp_path):
    """render 4 uninterrupted == render 2 + checkpoint + resume to 4,
    bitwise (the resume path must restore the accumulator AND draw the
    same RNG sample stream — regression test for the PRNGKey-vs-
    jax.random.key impl mismatch)."""
    # Uninterrupted run: 4 iterations.
    main([tiny_scene, "--outdir", str(tmp_path), "--out", "full",
          "--iterations", "4"])
    # Interrupted run: 2 iterations with a checkpoint at 2...
    main([tiny_scene, "--outdir", str(tmp_path), "--out", "part",
          "--iterations", "2", "--checkpoint-every", "2"])
    assert (tmp_path / "part.ckpt.npz").exists()
    # ...then resume to the full budget of 4.
    main([tiny_scene, "--outdir", str(tmp_path), "--out", "part",
          "--iterations", "4", "--resume"])

    a = read_png(str(tmp_path / "full.png"))
    b = read_png(str(tmp_path / "part.png"))
    np.testing.assert_array_equal(a, b)


def test_resume_without_checkpoint_starts_fresh(tiny_scene, tmp_path):
    rc = main([tiny_scene, "--outdir", str(tmp_path), "--out", "c",
               "--iterations", "1", "--resume"])
    assert rc == 0
    assert (tmp_path / "c.png").exists()


def test_timestamp_name(tiny_scene, tmp_path):
    main([tiny_scene, "--outdir", str(tmp_path), "--out", "d",
          "--iterations", "1", "--timestamp-name"])
    hits = [f for f in os.listdir(tmp_path)
            if f.startswith("d.") and f.endswith("1samp.png")]
    assert len(hits) == 1, os.listdir(tmp_path)
