"""Network snapshot loading for the inference tools.

Replaces reference legacy.load_network_pkl + persistence re-exec
(reference: stylegan2ada/legacy.py:20-60, torch_utils/persistence.py) with
config-reconstruct: a snapshot is a msgpack pytree next to the run's
training_options.json; the generator module is rebuilt from the registry
using the saved config, then the EMA params are loaded into it.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from style_big_gan_tpu import registries
from style_big_gan_tpu.utils import checkpoint as ckpt


def find_snapshot(run_dir: str, snapshot: Optional[str] = None) -> str:
    if snapshot:
        # Accept absolute/cwd-relative paths AND bare names inside run_dir.
        # An explicit snapshot that cannot be found is an error — silently
        # evaluating the latest snapshot instead would misattribute results.
        for cand in (snapshot, os.path.join(run_dir, snapshot)):
            if os.path.isfile(cand):
                return cand
        raise FileNotFoundError(
            f"snapshot {snapshot!r} not found (also tried under {run_dir})")
    snaps = sorted(f for f in os.listdir(run_dir)
                   if f.startswith("network-snapshot-") and
                   f.endswith(".msgpack"))
    if not snaps:
        raise FileNotFoundError(f"No snapshots in {run_dir}")
    return os.path.join(run_dir, snaps[-1])


def load_generator(run_dir: str, snapshot: Optional[str] = None,
                   use_ema: bool = True):
    """-> (G module, g_vars dict, options dict)."""
    registries._import_all()
    opts = ckpt.load_json(os.path.join(run_dir, "training_options.json"))
    payload = ckpt.load_pytree_raw(find_snapshot(run_dir, snapshot))

    gen_name = opts["gen"]["generator"]
    gen_kwargs = dict(opts["gens_args"][gen_name])
    ds_args = opts["datasets_args"][opts["data"]["dataset"]]
    # Probe resolution/channels from the saved params if possible, else the
    # dataset config; fall back to model defaults.
    meta = opts.get("model_meta", {})
    common = dict(
        c_dim=int(meta.get("label_dim", opts.get("label_dim", 0) or 0)),
        img_resolution=int(meta.get("resolution",
                                    opts.get("resolution", 0) or 0) or
                           gen_kwargs.pop("img_resolution", 0) or 32),
        img_channels=int(meta.get("img_channels", 3)))
    G = registries.generators[gen_name](**common, **gen_kwargs)

    params = payload["params_g_ema" if use_ema else "params_g"]
    g_state = payload.get("g_state_ema" if use_ema else "g_state", {})
    g_vars = {"params": jax.tree_util.tree_map(jnp.asarray, params)}
    for k, v in (g_state or {}).items():
        g_vars[k] = jax.tree_util.tree_map(jnp.asarray, v)
    return G, g_vars, opts


def images_to_uint8(img: np.ndarray) -> np.ndarray:
    return np.rint((np.asarray(img) + 1) * 127.5).clip(0, 255).astype(np.uint8)


def images_to_uint8_device(img):
    """Same [-1,1] -> uint8 conversion, on device: metric loops feed the
    result straight to a jitted detector (a host round-trip per batch is
    the dominant metric cost on tunneled TPUs)."""
    import jax.numpy as jnp
    return jnp.clip(jnp.rint((img.astype(jnp.float32) + 1) * 127.5),
                    0, 255).astype(jnp.uint8)
