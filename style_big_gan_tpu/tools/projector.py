"""Project a target image into W space.

Rebuild of reference stylegan2ada/projector.py:25-205: optimize (w + noise
buffers) with Adam for `num_steps`, cosine LR ramp, w-noise annealing, and
noise-buffer regularization (shift-correlation pyramid) + renormalization.
The perceptual distance uses a feature detector from the metrics registry
('vgg16_lpips' when weights are available, 'fake_v1' fallback for smoke use)
— jitted end-to-end, optimization loop on device.

    python -m style_big_gan_tpu.tools.projector \
        --run-dir logs/00000-run --target img.png --outdir proj/
"""

from __future__ import annotations

import argparse
import os
from typing import Optional

import numpy as np


def project(G, g_vars, target_u8: np.ndarray, *, num_steps=1000,
            w_avg_samples=10000, initial_learning_rate=0.1,
            initial_noise_factor=0.05, lr_rampdown_length=0.25,
            lr_rampup_length=0.05, noise_ramp_length=0.75,
            regularize_noise_weight=1e5, seed=303, verbose=True,
            vgg16_path=None):
    """reference: projector.py:25-131.  Returns w trajectory
    [num_steps, num_ws, w_dim]."""
    import jax
    import jax.numpy as jnp
    import optax

    z_dim = int(G.z_dim)
    rnd = np.random.RandomState(seed)

    # W statistics (reference: projector.py:49-54).
    z_samples = jnp.asarray(rnd.randn(w_avg_samples, z_dim), jnp.float32)
    # Conditional models: average W over class-0 mappings (the reference
    # projector assumes unconditional G, projector.py:49-54; a zero/one-hot
    # label keeps it usable on conditional snapshots).
    c_dim = int(getattr(G, "c_dim", 0))
    c = jnp.zeros((w_avg_samples, c_dim), jnp.float32)
    if c_dim > 0:
        c = c.at[:, 0].set(1.0)
    ws = G.apply(g_vars, z_samples, c, method=G.map_ws)
    ws = np.asarray(ws[:, :1, :]).astype(np.float64)
    w_avg = np.mean(ws, axis=0, keepdims=True)
    w_std = (np.sum((ws - w_avg) ** 2) / w_avg_samples) ** 0.5
    num_ws = G.num_ws

    target = jnp.asarray(target_u8.astype(np.float32) / 127.5 - 1.0)[None]

    # Differentiable perceptual features.  With vgg16_path: the real
    # LPIPS-VGG embedding (reference: projector.py:60-68; squared L2 ==
    # LPIPS distance), native JAX.  Without weights: a fixed random-conv
    # embedding mirroring the 'fake_v1' detector, for smoke use.
    if vgg16_path:
        from style_big_gan_tpu.metrics.vgg16_jax import (VGG16LPIPS,
                                                         load_params_npz)
        vgg_params = load_params_npz(vgg16_path)
        vgg = VGG16LPIPS()

        def feat(img):
            x = img
            if x.shape[-1] == 1:
                x = jnp.tile(x, (1, 1, 1, 3))
            n, h, w, c = x.shape
            if h > 256:
                # Area (mean-pool) downsample to 256, matching the reference
                # projector's F.interpolate(mode='area') (projector.py:63-66).
                f = h // 256
                x = x.reshape(n, 256, f, 256, f, c).mean(axis=(2, 4))
            return vgg.apply(vgg_params, x)
    else:
        k1, k2 = jax.random.split(jax.random.PRNGKey(1234))
        w1 = jax.random.normal(k1, (5, 5, 3, 32)) * 0.1
        w2 = jax.random.normal(k2, (3, 3, 32, 256)) * 0.1
        dn = ("NHWC", "HWIO", "NHWC")

        def feat(img):
            x = img
            if x.shape[-1] == 1:
                x = jnp.tile(x, (1, 1, 1, 3))
            x = jax.nn.relu(jax.lax.conv_general_dilated(
                x, w1, (4, 4), "SAME", dimension_numbers=dn))
            x = jax.nn.relu(jax.lax.conv_general_dilated(
                x, w2, (4, 4), "SAME", dimension_numbers=dn))
            return jnp.mean(x, axis=(1, 2))

    target_features = feat(target)

    # Optimize w jointly with the per-layer constant noise buffers
    # (reference: projector.py:44-47, 104-126): shift-correlation pyramid
    # regularization on the noise, renormalized to N(0,1) after each step.
    other_vars = {k: v for k, v in g_vars.items() if k != "noise"}
    noise0 = g_vars.get("noise", {})

    def noise_reg(noise_tree):
        reg = jnp.float32(0.0)
        for buf in jax.tree_util.tree_leaves(noise_tree):
            n = buf[..., 0] if buf.ndim == 3 else buf          # [h, w]
            while n.shape[0] >= 8:
                reg += jnp.square(jnp.mean(n * jnp.roll(n, 1, axis=1)))
                reg += jnp.square(jnp.mean(n * jnp.roll(n, 1, axis=0)))
                n = n.reshape(n.shape[0] // 2, 2,
                              n.shape[1] // 2, 2).mean(axis=(1, 3))
        return reg

    w_opt0 = jnp.asarray(w_avg, jnp.float32)          # [1, 1, w_dim]
    opt = optax.adam(initial_learning_rate, b1=0.9, b2=0.999)
    state0 = (w_opt0, noise0)
    opt_state = opt.init(state0)

    @jax.jit
    def step_fn(state, opt_state, w_noise_scale, lr_scale, key):
        def lf(state):
            w, noise_tree = state
            wn = w + jax.random.normal(key, w.shape) * w_noise_scale
            ws_full = jnp.tile(wn, (1, num_ws, 1))
            img = G.apply({**other_vars, "noise": noise_tree}, ws_full,
                          method=G.synthesize, noise_mode="const",
                          rngs={"noise": jax.random.PRNGKey(0)})
            f = feat(img)
            dist = jnp.sum((f - target_features) ** 2)
            return dist + noise_reg(noise_tree) * regularize_noise_weight, \
                dist
        (_, dist), grads = jax.value_and_grad(lf, has_aux=True)(state)
        updates, opt_state = opt.update(grads, opt_state, state)
        updates = jax.tree_util.tree_map(lambda u: u * lr_scale, updates)
        w_opt, noise_tree = optax.apply_updates(state, updates)
        # Renormalize noise buffers (reference: projector.py:122-126).
        noise_tree = jax.tree_util.tree_map(
            lambda n: (n - jnp.mean(n)) / (jnp.std(n) + 1e-8), noise_tree)
        return (w_opt, noise_tree), opt_state, dist

    state = state0
    w_out = np.zeros((num_steps, 1, int(G.w_dim)), np.float32)
    key = jax.random.PRNGKey(seed)
    for step in range(num_steps):
        t = step / num_steps
        w_noise_scale = w_std * initial_noise_factor * \
            max(0.0, 1.0 - t / noise_ramp_length) ** 2
        lr_ramp = min(1.0, (1.0 - t) / lr_rampdown_length)
        lr_ramp = 0.5 - 0.5 * np.cos(lr_ramp * np.pi)
        lr_ramp = lr_ramp * min(1.0, t / lr_rampup_length)
        key, sub = jax.random.split(key)
        state, opt_state, dist = step_fn(state, opt_state,
                                         float(w_noise_scale),
                                         float(lr_ramp), sub)
        w_out[step] = np.asarray(state[0][0])
        if verbose and (step + 1) % 100 == 0:
            print(f"step {step + 1:>4d}/{num_steps}: dist {float(dist):<5.2f}")
    return np.tile(w_out[:, :, None, :], (1, 1, num_ws, 1))[:, 0]


def run_projection(run_dir: str, target_path: str, outdir: str,
                   num_steps: int = 1000, seed: int = 303,
                   snapshot: Optional[str] = None, save_video: bool = False,
                   vgg16_path: Optional[str] = None):
    """reference: projector.py:142-205."""
    import jax.numpy as jnp
    import PIL.Image
    from style_big_gan_tpu.tools.loader import (images_to_uint8,
                                                load_generator)
    import jax

    G, g_vars, _ = load_generator(run_dir, snapshot)
    target_pil = PIL.Image.open(target_path).convert("RGB")
    res = int(G.img_resolution)
    s = min(target_pil.size)
    target_pil = target_pil.crop(((target_pil.size[0] - s) // 2,
                                  (target_pil.size[1] - s) // 2,
                                  (target_pil.size[0] + s) // 2,
                                  (target_pil.size[1] + s) // 2))
    target_pil = target_pil.resize((res, res), PIL.Image.LANCZOS)
    target_u8 = np.array(target_pil, dtype=np.uint8)

    w_steps = project(G, g_vars, target_u8, num_steps=num_steps, seed=seed,
                      vgg16_path=vgg16_path)
    os.makedirs(outdir, exist_ok=True)
    target_pil.save(os.path.join(outdir, "target.png"))

    synth = jax.jit(lambda w: G.apply(
        g_vars, w, method=G.synthesize, noise_mode="const",
        rngs={"noise": jax.random.PRNGKey(0)}))

    if save_video:
        # Optimization-progress video, target | current frame side by side
        # (reference: projector.py:160-170).  At most ~200 frames: the
        # trajectory is subsampled so long runs stay cheap to render.
        stride = max(1, len(w_steps) // 200)
        frames_w = jnp.asarray(w_steps[::stride])
        frames = []
        for i in range(0, int(frames_w.shape[0]), 8):
            for fr in images_to_uint8(synth(frames_w[i:i + 8])):
                frames.append(np.concatenate([target_u8, fr], axis=1))
        import imageio
        try:
            video_path = os.path.join(outdir, "proj.mp4")
            imageio.mimwrite(video_path, frames, fps=20)
        except Exception:   # no ffmpeg plugin -> GIF via pillow
            video_path = os.path.join(outdir, "proj.gif")
            imageio.mimwrite(video_path, frames, duration=50, loop=0)
        print(f"wrote {video_path}")

    w_final = w_steps[-1]
    img = synth(jnp.asarray(w_final[None]))
    PIL.Image.fromarray(images_to_uint8(img)[0], "RGB").save(
        os.path.join(outdir, "proj.png"))
    np.savez(os.path.join(outdir, "projected_w.npz"), w=w_final[None])
    print(f"wrote {outdir}/proj.png and projected_w.npz")


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--run-dir", required=True)
    p.add_argument("--target", required=True)
    p.add_argument("--num-steps", type=int, default=1000)
    p.add_argument("--seed", type=int, default=303)
    p.add_argument("--snapshot", default=None)
    p.add_argument("--outdir", required=True)
    p.add_argument("--vgg16", default=None,
                   help="LPIPS-VGG weights .npz (tools/convert_detector.py);"
                        " omitted = random-conv smoke features")
    p.add_argument("--save-video", action="store_true",
                   help="write proj.mp4 optimization-progress video "
                        "(reference projector.py --save-video)")
    a = p.parse_args(argv)
    run_projection(a.run_dir, a.target, a.outdir, a.num_steps, a.seed,
                   a.snapshot, save_video=a.save_video, vgg16_path=a.vgg16)


if __name__ == "__main__":
    main()
