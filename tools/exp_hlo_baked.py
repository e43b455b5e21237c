"""Map the BAKED cornell forward's hot fusion names to HLO bodies/source
lines (successor to tools/exp_hlo_map.py after scene baking).

Usage: python tools/exp_hlo_baked.py [fusion names...]
"""
from __future__ import annotations

import os
import re
import sys
from collections import Counter

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

CHUNK = 20
DEFAULT = ["fusion.310", "fusion.311", "fusion.312",
           "multiply_add_fusion.110", "select_and_fusion.10",
           "compare_select_fusion.36", "fusion.304"]


def main():
    names = sys.argv[1:] or DEFAULT
    import numpy as np
    import jax
    import jax.numpy as jnp
    from functools import partial
    from project3_cuda_path_tracer_tpu import load_scene
    from project3_cuda_path_tracer_tpu.render import integrator as I

    print("backend:", jax.default_backend(), flush=True)
    s = load_scene(os.path.join(ROOT, "scenes/cornell.txt"))
    r = I.Renderer(s)
    geoms_c, mats_c, tex_c = I.bake_tables(s)
    cfg = r.cfg

    @partial(jax.jit, static_argnames=("chunk",), donate_argnames=("accum",))
    def baked(accum, cam, textures, base_key, start_iter, chunk):
        def one(acc, i):
            key = jax.random.fold_in(base_key, start_iter + i)
            return acc + I.render_radiance(
                mats_c, cam, geoms_c, s.meshes, tex_c, key, cfg,
                packed_meshes=s.packed_meshes,
                iteration=start_iter + i), None
        out, _ = jax.lax.scan(one, accum, jnp.arange(chunk, dtype=jnp.int32))
        return out

    lowered = baked.lower(jnp.zeros((800, 800, 3), jnp.float32),
                          s.camera.flat(), jnp.zeros((0,)),
                          jax.random.PRNGKey(0), jnp.int32(0), CHUNK)
    txt = lowered.compile().as_text()
    open("/tmp/baked_hlo.txt", "w").write(txt)
    print(f"HLO -> /tmp/baked_hlo.txt ({len(txt)} chars)", flush=True)

    for name in names:
        m = re.search(re.escape(name) + r"[^\n]*calls=%?([\w.\-]+)", txt)
        if not m:
            print(f"\n### {name}: not found")
            continue
        comp = m.group(1)
        cm = re.search(r"^%?" + re.escape(comp) + r" [^\n]*\{", txt, re.M)
        start = cm.start()
        end = txt.find("\n}", start)
        body = txt[start:end]
        srcs = Counter()
        ops = Counter()
        for line in body.splitlines():
            om = re.match(r"\s+%[\w.\-]+ = \S+ (\w[\w\-]*)\(", line)
            if om:
                ops[om.group(1)] += 1
            sm = re.search(r'source_file="([^"]+)" source_line=(\d+)', line)
            if sm:
                srcs[(sm.group(1).split("/")[-1], sm.group(2))] += 1
        print(f"\n### {name} ({comp}): "
              f"{sum(ops.values())} ops: "
              + ", ".join(f"{o}x{c}" for o, c in ops.most_common(8)))
        for (f, l), c in srcs.most_common(6):
            print(f"   {c:4d}  {f}:{l}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
