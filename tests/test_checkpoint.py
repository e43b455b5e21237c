"""Checkpoint/resume subsystem (SURVEY §5.4)."""
import numpy as np
import pytest

from project3_cuda_path_tracer_tpu.render import checkpoint as ckpt


def test_roundtrip(tmp_path):
    scene = tmp_path / "s.txt"
    scene.write_text("MATERIAL 0\nRGB 1 1 1\n")
    acc = np.random.default_rng(0).random((4, 4, 3)).astype(np.float32)
    path = str(tmp_path / "c.ckpt.npz")
    ckpt.save_checkpoint(path, acc, 17, 42, str(scene))
    back, it, seed = ckpt.load_checkpoint(path, str(scene))
    np.testing.assert_array_equal(back, acc)
    assert it == 17 and seed == 42


def test_scene_hash_guard(tmp_path):
    s1 = tmp_path / "a.txt"; s1.write_text("MATERIAL 0\nRGB 1 1 1\n")
    s2 = tmp_path / "b.txt"; s2.write_text("MATERIAL 0\nRGB 0 0 1\n")
    path = str(tmp_path / "c.ckpt.npz")
    ckpt.save_checkpoint(path, np.zeros((2, 2, 3), np.float32), 1, 0,
                         str(s1))
    with pytest.raises(ValueError):
        ckpt.load_checkpoint(path, str(s2))


def test_find_checkpoint(tmp_path):
    base = str(tmp_path / "img")
    assert ckpt.find_checkpoint(base) is None
    ckpt_path = base + ".ckpt.npz"
    scene = tmp_path / "s.txt"; scene.write_text("x")
    ckpt.save_checkpoint(ckpt_path, np.zeros((1, 1, 3), np.float32), 0, 0,
                         str(scene))
    assert ckpt.find_checkpoint(base) == ckpt_path
