"""Checkpoint / resume of progressive renders (SURVEY §5.4).

The reference's accumulation buffer is a natural checkpoint (state =
dev_image sums + iteration count; finalizable at any time,
reference src/main.cpp:79-89) but resume is not implemented there. Here it
is: state = (accum image, iteration, base RNG key, scene-file hash). The
scene hash guards against resuming onto a different scene.
"""
from __future__ import annotations

import hashlib
import os
from typing import Optional, Tuple

import numpy as np


def scene_hash(path: str) -> str:
    with open(path, "rb") as f:
        return hashlib.sha256(f.read()).hexdigest()[:16]


def save_checkpoint(path: str, accum: np.ndarray, iteration: int,
                    seed: int, scene_path: str,
                    extras: Optional[dict] = None) -> None:
    """`extras` holds renderer-mode state beyond the reference's natural
    (accum, iteration) pair — e.g. adaptive sampling's per-pixel count and
    luminance^2 sums — stored under an `x_` prefix."""
    xs = {f"x_{k}": np.asarray(v) for k, v in (extras or {}).items()}
    np.savez_compressed(
        path, accum=np.asarray(accum), iteration=np.int64(iteration),
        seed=np.int64(seed),
        scene_hash=np.frombuffer(
            scene_hash(scene_path).encode(), dtype=np.uint8), **xs)


def load_checkpoint(path: str, scene_path: str
                    ) -> Tuple[np.ndarray, int, int]:
    """Returns (accum, iteration, seed); raises if the scene changed."""
    with np.load(path) as z:
        stored = bytes(z["scene_hash"]).decode()
        current = scene_hash(scene_path)
        if stored != current:
            raise ValueError(
                f"checkpoint was created for a different scene "
                f"(hash {stored} != {current})")
        return (np.asarray(z["accum"]), int(z["iteration"]), int(z["seed"]))


def load_extras(path: str) -> dict:
    """The `x_`-prefixed extras a checkpoint carries (empty for plain
    uniform-render checkpoints)."""
    with np.load(path) as z:
        return {k[2:]: np.asarray(z[k]) for k in z.files
                if k.startswith("x_")}


def find_checkpoint(base: str) -> Optional[str]:
    p = base + ".ckpt.npz"
    return p if os.path.exists(p) else None
