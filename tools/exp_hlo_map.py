"""Map profiled fusion names to their HLO bodies for the scanned forward
cornell render (same program shape as tools/exp_profile_fwd.py).

Compiles render_chunk AOT and prints the named fusion computations so the
trace's hot fusions (fusion.321, select_add_fusion.6, ...) can be read.

Usage: python tools/exp_hlo_map.py name1 name2 ...   (default: the round-2
hot list)
"""
from __future__ import annotations

import os
import re
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

W = H = 800
DEPTH = 8
CHUNK = 20

DEFAULT = ["fusion.321", "select_add_fusion.6", "select_select_fusion.46",
           "multiply_add_fusion.152", "add_maximum_fusion.8",
           "sqrt_select_fusion.14", "compare_select_fusion.33",
           "fusion.322", "fusion.323"]


def main():
    names = sys.argv[1:] or DEFAULT
    import numpy as np
    import jax
    import jax.numpy as jnp
    from project3_cuda_path_tracer_tpu import load_scene
    from project3_cuda_path_tracer_tpu.render import integrator as I

    print("backend:", jax.default_backend(), flush=True)
    s = load_scene(os.path.join(ROOT, "scenes/cornell.txt"))
    gt = tuple(int(t) for t in np.asarray(s.geoms.type))
    cfg = I.TraceConfig(width=W, height=H, trace_depth=DEPTH,
                        antialias=True, geom_types=gt, glossy=False,
                        sky=False)
    accum = jnp.zeros((H, W, 3), jnp.float32)
    key = jax.random.PRNGKey(0)

    lowered = I.render_chunk.lower(accum, s.materials, s.camera.flat(),
                                   s.geoms, s.meshes, s.textures, key, 0,
                                   cfg, CHUNK)
    compiled = lowered.compile()
    txt = compiled.as_text()
    out = os.path.join("/tmp", "render_chunk_hlo.txt")
    with open(out, "w") as f:
        f.write(txt)
    print(f"full HLO -> {out} ({len(txt)} chars)", flush=True)

    # Print the fusion *instruction* (call site, shows operand shapes) and
    # its computation body.
    for name in names:
        print("\n" + "=" * 70)
        print("###", name)
        # call site(s)
        for m in re.finditer(r"^.*%?" + re.escape(name) + r" = .*$", txt,
                             re.M):
            line = m.group(0)
            print("CALL:", line[:500])
        # computation body: "%fused_computation.N (...) {" — find via
        # calls=%fused_computation.X in the call line
        for m in re.finditer(re.escape(name) + r"[^\n]*calls=%?([\w.\-]+)",
                             txt):
            comp = m.group(1)
            cm = re.search(r"^%?" + re.escape(comp) + r" [^\n]*\{", txt, re.M)
            if not cm:
                continue
            start = cm.start()
            end = txt.find("\n}", start)
            body = txt[start:end + 2]
            if len(body) > 4000:
                body = body[:4000] + "\n... [truncated]"
            print(body)
    return 0


if __name__ == "__main__":
    sys.exit(main())
