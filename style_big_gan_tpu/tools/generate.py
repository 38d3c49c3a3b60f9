"""Generate images from a trained snapshot.

Rebuild of reference stylegan2ada/generate.py:46-129 on the msgpack/config
snapshot format (tools/loader.py).

    python -m style_big_gan_tpu.tools.generate \
        --run-dir logs/00000-run --seeds 0-7 --trunc 0.7 --outdir out/
"""

from __future__ import annotations

import argparse
import os
import re
from typing import List, Optional

import numpy as np


def parse_range(s: str) -> List[int]:
    """'1,2,5-10' -> [1, 2, 5, ..., 10] (reference: generate.py:25-36)."""
    ranges = []
    for p in str(s).split(","):
        m = re.match(r"^(\d+)-(\d+)$", p)
        if m:
            ranges.extend(range(int(m.group(1)), int(m.group(2)) + 1))
        else:
            ranges.append(int(p))
    return ranges


def _save_png(arr_u8: np.ndarray, path: str):
    import PIL.Image
    if arr_u8.shape[-1] == 1:
        PIL.Image.fromarray(arr_u8[:, :, 0], "L").save(path)
    else:
        PIL.Image.fromarray(arr_u8, "RGB").save(path)


def generate_images(run_dir: str, seeds: List[int], outdir: str,
                    truncation_psi: float = 1.0, noise_mode: str = "const",
                    class_idx: Optional[int] = None,
                    snapshot: Optional[str] = None,
                    projected_w: Optional[str] = None):
    import jax
    import jax.numpy as jnp
    import PIL.Image
    from style_big_gan_tpu.tools.loader import (images_to_uint8,
                                                load_generator)

    G, g_vars, _opts = load_generator(run_dir, snapshot)
    os.makedirs(outdir, exist_ok=True)

    if projected_w is not None:
        # Render a projector trajectory (reference: generate.py:73-84):
        # each row of the .npz 'w' array is a [num_ws, w_dim] latent.
        ws = np.load(projected_w)["w"]
        assert ws.ndim == 3 and ws.shape[1:] == (int(G.num_ws),
                                                 int(G.w_dim)), ws.shape
        synth = jax.jit(lambda w: G.apply(
            g_vars, w, method=G.synthesize, noise_mode=noise_mode,
            rngs={"noise": jax.random.PRNGKey(0)}))
        for idx in range(ws.shape[0]):
            img = images_to_uint8(synth(jnp.asarray(ws[idx:idx + 1],
                                                    jnp.float32)))
            _save_png(img[0], os.path.join(outdir, f"proj{idx:02d}.png"))
            print(f"w {idx} -> {outdir}/proj{idx:02d}.png")
        return
    c_dim = int(getattr(G, "c_dim", 0))
    label = np.zeros((1, c_dim), np.float32)
    if c_dim > 0:
        if class_idx is None:
            print("warning: no class specified for conditional model, "
                  "using class 0")
            class_idx = 0
        label[0, class_idx] = 1.0
    elif class_idx is not None:
        print("warning: --class ignored on an unconditional network")

    import inspect
    has_trunc = "truncation_psi" in inspect.signature(
        type(G).__call__).parameters

    @jax.jit
    def run(z, c):
        kwargs = dict(rngs={"noise": jax.random.PRNGKey(0)})
        if has_trunc:
            return G.apply(g_vars, z, c, truncation_psi=truncation_psi,
                           noise_mode=noise_mode, **kwargs)
        return G.apply(g_vars, z, c, train=False, **kwargs)

    for seed in seeds:
        z = jnp.asarray(np.random.RandomState(seed).randn(
            1, int(getattr(G, "z_dim", 128))), jnp.float32)
        img = images_to_uint8(run(z, jnp.asarray(label)))
        _save_png(img[0], os.path.join(outdir, f"seed{seed:04d}.png"))
        print(f"seed {seed} -> {outdir}/seed{seed:04d}.png")


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--run-dir", required=True)
    p.add_argument("--snapshot", default=None)
    p.add_argument("--seeds", default="0-3")
    p.add_argument("--trunc", type=float, default=1.0)
    p.add_argument("--noise-mode", default="const",
                   choices=["random", "const", "none"])
    p.add_argument("--class", dest="class_idx", type=int, default=None)
    p.add_argument("--projected-w", default=None,
                   help="projected_w.npz from tools/projector.py; renders "
                        "its W rows instead of seeds")
    p.add_argument("--outdir", required=True)
    a = p.parse_args(argv)
    generate_images(a.run_dir, parse_range(a.seeds), a.outdir, a.trunc,
                    a.noise_mode, a.class_idx, a.snapshot, a.projected_w)


if __name__ == "__main__":
    main()
