"""W-space style-mixing grid.

Rebuild of reference stylegan2ada/style_mixing.py:45-118: map row/col seeds
to w, synthesize the cross-mixing matrix (col styles up to `col_styles`
replace row styles) and write a grid PNG.

    python -m style_big_gan_tpu.tools.style_mixing \
        --run-dir logs/00000-run --rows 85,100 --cols 55,821 --outdir out/
"""

from __future__ import annotations

import argparse
import os
from typing import List

import numpy as np


def generate_style_mix(run_dir: str, row_seeds: List[int],
                       col_seeds: List[int], col_styles: List[int],
                       truncation_psi: float = 1.0, outdir: str = "out",
                       snapshot=None, class_idx: int = 0):
    import jax
    import jax.numpy as jnp
    import PIL.Image
    from style_big_gan_tpu.tools.loader import (images_to_uint8,
                                                load_generator)

    G, g_vars, _ = load_generator(run_dir, snapshot)
    if not hasattr(G, "map_ws"):
        raise ValueError("style mixing requires a style-based generator")
    os.makedirs(outdir, exist_ok=True)

    all_seeds = list(dict.fromkeys(row_seeds + col_seeds))
    z = np.stack([np.random.RandomState(s).randn(G.z_dim)
                  for s in all_seeds]).astype(np.float32)
    c_dim = int(getattr(G, "c_dim", 0))
    c = jnp.zeros((len(all_seeds), c_dim), jnp.float32)
    if c_dim > 0:
        # Conditional model: mix within one class (--class, default 0).
        c = c.at[:, class_idx].set(1.0)

    ws = G.apply(g_vars, jnp.asarray(z), c, method=G.map_ws,
                 truncation_psi=truncation_psi)
    w_dict = {seed: np.asarray(ws[i]) for i, seed in enumerate(all_seeds)}

    @jax.jit
    def synth(w):
        return G.apply(g_vars, w, method=G.synthesize, noise_mode="const",
                       rngs={"noise": jax.random.PRNGKey(0)})

    image_dict = {}
    for seed in all_seeds:
        img = images_to_uint8(synth(jnp.asarray(w_dict[seed][None])))[0]
        image_dict[(seed, seed)] = img

    for row_seed in row_seeds:
        for col_seed in col_seeds:
            w = w_dict[row_seed].copy()
            w[col_styles] = w_dict[col_seed][col_styles]
            image_dict[(row_seed, col_seed)] = images_to_uint8(
                synth(jnp.asarray(w[None])))[0]

    for (rs, cs), image in image_dict.items():
        PIL.Image.fromarray(image, "RGB").save(
            os.path.join(outdir, f"{rs}-{cs}.png"))

    # Assemble grid with white top-left corner (reference:
    # style_mixing.py:88-108).
    res = int(G.img_resolution)
    W = res * (len(col_seeds) + 1)
    H = res * (len(row_seeds) + 1)
    canvas = PIL.Image.new("RGB", (W, H), "black")
    for row_idx, row_seed in enumerate([0] + row_seeds):
        for col_idx, col_seed in enumerate([0] + col_seeds):
            if row_idx == 0 and col_idx == 0:
                continue
            key = (row_seed, col_seed)
            if row_idx == 0:
                key = (col_seed, col_seed)
            if col_idx == 0:
                key = (row_seed, row_seed)
            canvas.paste(PIL.Image.fromarray(image_dict[key], "RGB"),
                         (res * col_idx, res * row_idx))
    canvas.save(os.path.join(outdir, "grid.png"))
    print(f"wrote {outdir}/grid.png")


def main(argv=None):
    from style_big_gan_tpu.tools.generate import parse_range
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--run-dir", required=True)
    p.add_argument("--snapshot", default=None)
    p.add_argument("--rows", required=True)
    p.add_argument("--cols", required=True)
    p.add_argument("--styles", default="0-6")
    p.add_argument("--trunc", type=float, default=1.0)
    p.add_argument("--class", dest="class_idx", type=int, default=0)
    p.add_argument("--outdir", required=True)
    a = p.parse_args(argv)
    generate_style_mix(a.run_dir, parse_range(a.rows), parse_range(a.cols),
                       parse_range(a.styles), a.trunc, a.outdir, a.snapshot,
                       class_idx=a.class_idx)


if __name__ == "__main__":
    main()
