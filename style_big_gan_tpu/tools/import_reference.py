"""Import reference (PyTorch) StyleGAN2 checkpoints into this framework.

TPU-native counterpart of reference stylegan2ada/legacy.py:20-60: instead of
re-executing pickled source (persistence.py), network pickles are opened with
a tolerant unpickler that captures each persistent object's init kwargs and
state dict, and the tensors are renamed/transposed into this framework's
variable trees:

  torch layout            ->  this framework (NHWC / HWIO / [in, out])
  linear  [out, in]       ->  [in, out]           (transpose)
  conv    [O, I, kh, kw]  ->  [kh, kw, I, O]      (transpose 2,3,1,0)
  const   [C, H, W]       ->  [H, W, C]
  noise_const [H, W]      ->  [H, W, 1]
  w_avg                   ->  'moving' collection

Equalized-LR runtime scaling conventions match the reference exactly, so raw
tensors map 1:1 with no rescaling.
"""

from __future__ import annotations

import pickle
from typing import Any, Dict, Optional, Tuple

import numpy as np


class _Stub:
    """Generic attribute bag standing in for any unimportable class."""

    def __init__(self, *args, **kwargs):
        self.args = args
        self.kwargs = kwargs

    def __setstate__(self, state):
        self.__dict__.update(state if isinstance(state, dict) else {})


def _reconstruct_stub(meta):
    return meta


def load_reference_pickle(path: str) -> Dict[str, Any]:
    """Open a reference network snapshot pickle; returns the raw dict with
    persistent objects replaced by their metadata (class_name, init kwargs,
    state with torch tensors)."""
    import torch

    class TolerantUnpickler(pickle.Unpickler):
        def find_class(self, module, name):
            if name == "_reconstruct_persistent_obj":
                return _reconstruct_stub
            try:
                return super().find_class(module, name)
            except (ImportError, AttributeError):
                return _Stub

    # torch.load drives storage deserialization; give it our unpickler.
    class _PickleModule:
        Unpickler = TolerantUnpickler

        @staticmethod
        def load(f, **kw):
            return TolerantUnpickler(f).load()

    with open(path, "rb") as f:
        return torch.load(f, map_location="cpu", pickle_module=_PickleModule,
                          weights_only=False)


def torch_state_to_numpy(module_or_state) -> Dict[str, np.ndarray]:
    """state_dict (torch module / dict / persistence meta) -> {name: np}."""
    if hasattr(module_or_state, "state_dict"):
        state = module_or_state.state_dict()
    elif isinstance(module_or_state, dict) and "state" in module_or_state:
        state = module_or_state["state"]
        if isinstance(state, dict) and "state_dict" in state:
            state = state["state_dict"]
    else:
        state = module_or_state
    out = {}
    for k, v in state.items():
        if hasattr(v, "detach"):
            out[k] = v.detach().cpu().numpy()
        elif isinstance(v, np.ndarray):
            out[k] = v
    return out


def _t_linear(w):
    return np.transpose(w, (1, 0))


def _t_conv(w):
    return np.transpose(w, (2, 3, 1, 0))


def convert_sg2_generator(state: Dict[str, np.ndarray]
                          ) -> Tuple[Dict, Dict, Dict]:
    """NVlabs-style G state_dict -> (params, moving, noise) trees matching
    models/stylegan2.Generator."""
    params: Dict[str, Any] = {"mapping": {}, "synthesis": {}}
    moving: Dict[str, Any] = {"mapping": {}}
    noise: Dict[str, Any] = {"synthesis": {}}

    def put(tree, path, value):
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = np.asarray(value, np.float32)

    for name, w in state.items():
        parts = name.split(".")
        if parts[0] == "mapping":
            if parts[1] == "w_avg":
                put(moving, ["mapping", "w_avg"], w)
            elif parts[1] == "embed":
                put(params, ["mapping", "embed",
                             "weight" if parts[2] == "weight" else "bias"],
                    _t_linear(w) if parts[2] == "weight" else w)
            elif parts[1].startswith("fc"):
                put(params, ["mapping", parts[1], parts[2]],
                    _t_linear(w) if parts[2] == "weight" else w)
        elif parts[0] == "synthesis":
            block = parts[1]                       # b4, b8, ...
            if parts[2] == "const":
                put(params, ["synthesis", block, "const"],
                    np.transpose(w, (1, 2, 0)))
            elif parts[2] in ("conv0", "conv1", "torgb"):
                layer = parts[2]
                rest = parts[3:]
                base = ["synthesis", block, layer]
                if rest[0] == "affine":
                    put(params, base + ["affine", rest[1]],
                        _t_linear(w) if rest[1] == "weight" else w)
                elif rest[0] == "weight":
                    put(params, base + ["weight"], _t_conv(w))
                elif rest[0] == "bias":
                    put(params, base + ["bias"], w)
                elif rest[0] == "noise_strength":
                    put(params, base + ["noise_strength"],
                        np.asarray(w).reshape(()))
                elif rest[0] == "noise_const":
                    put(noise, ["synthesis", block, layer, "noise_const"],
                        np.asarray(w)[..., None])
            elif parts[2] == "skip":
                put(params, ["synthesis", block, "skip", parts[3]],
                    _t_conv(w) if parts[3] == "weight" else w)
            elif parts[2] == "resample_filter":
                pass                                # constant, rebuilt
    return params, moving, noise


def convert_sg2_discriminator(state: Dict[str, np.ndarray]) -> Dict:
    """NVlabs-style D state_dict -> params tree matching
    models/stylegan2.Discriminator."""
    params: Dict[str, Any] = {}

    def put(path, value):
        node = params
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = np.asarray(value, np.float32)

    for name, w in state.items():
        parts = name.split(".")
        if parts[-1] == "resample_filter" or "mbstd" in name:
            continue
        block = parts[0]                           # b64..b8, b4, mapping
        if block == "mapping":
            if parts[1] == "w_avg":
                continue
            put(["mapping", parts[1], parts[2]],
                _t_linear(w) if parts[2] == "weight" else w)
            continue
        layer = parts[1]                           # fromrgb/conv0/conv1/skip/
        if layer in ("fromrgb", "conv0", "conv1", "skip", "conv"):
            put([block, layer, parts[2]],
                _t_conv(w) if parts[2] == "weight" else w)
        elif layer == "fc" and parts[2] == "weight":
            # The epilogue fc consumes the flattened 4x4 features: torch
            # flattens CHW, this framework flattens HWC — permute the input
            # ordering of the weight accordingly.
            out_f, in_f = w.shape
            c = in_f // 16
            w_hwc = np.transpose(w.reshape(out_f, c, 4, 4),
                                 (0, 2, 3, 1)).reshape(out_f, in_f)
            put([block, "fc", "weight"], _t_linear(w_hwc))
        elif layer in ("fc", "out"):
            put([block, layer, parts[2]],
                _t_linear(w) if parts[2] == "weight" else w)
    return params


def _l2n(v, eps=1e-12):
    return v / np.sqrt(np.sum(np.square(v)) + eps)


def convert_biggan_discriminator(state: Dict[str, np.ndarray]
                                 ) -> Tuple[Dict, Dict]:
    """BigGAN-style D state_dict (reference discriminators.py:732-842) ->
    (params, spectral) trees matching models/biggan.BigGANDiscriminator.

    Reference blocks are a doubly-nested ModuleList ``blocks.{i}.{j}`` where
    j=0 is the DBlock and j=1 an optional Attention; here they are flat
    ``block{i}`` / ``attn{i}``.  Spectral-norm u vectors map directly for
    convs/linears (both index rows by output channel); the embedding stores
    u in class space in the reference but feature space here (the weight is
    transposed), so u crosses through one half power-iteration
    ``u' = l2norm(u @ W)`` — singular-value estimates agree once iteration
    has converged (exactly, for orthogonal init).
    """
    params: Dict[str, Any] = {}
    spectral: Dict[str, Any] = {}

    def put(tree, path, value):
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = np.asarray(value, np.float32)

    def put_sn(module_path, u_rows):
        put(spectral, module_path + ["sn", "u"], np.stack(u_rows))

    # Collect u{k} buffers per module first (num_svs may be > 1).
    u_bufs: Dict[str, list] = {}
    for name, w in state.items():
        parts = name.split(".")
        if parts[-1].startswith("u") and parts[-1][1:].isdigit():
            u_bufs.setdefault(".".join(parts[:-1]), []).append(
                (int(parts[-1][1:]), np.asarray(w, np.float32).reshape(-1)))

    for name, w in state.items():
        parts = name.split(".")
        last = parts[-1]
        if last.startswith("sv") or (last.startswith("u")
                                     and last[1:].isdigit()):
            continue
        if parts[0] == "blocks":
            i, j = parts[1], int(parts[2])
            mod = "block" + i if j == 0 else "attn" + i
            if last == "gamma":
                put(params, [mod, "gamma"], np.asarray(w).reshape(()))
                continue
            layer = parts[3]
            if last == "weight":
                put(params, [mod, layer, "kernel"], _t_conv(w))
            elif last == "bias":
                put(params, [mod, layer, "bias"], w)
        elif parts[0] == "linear":
            if last == "weight":
                put(params, ["linear", "kernel"], _t_linear(w))
            elif last == "bias":
                put(params, ["linear", "bias"], w)
        elif parts[0] == "embed" and last == "weight":
            put(params, ["embed", "embedding"], w)

    for mod_path, us in u_bufs.items():
        us = [u for _, u in sorted(us)]
        parts = mod_path.split(".")
        if parts[0] == "blocks":
            mod = ("block" if int(parts[2]) == 0 else "attn") + parts[1]
            put_sn([mod, parts[3]], us)
        elif parts[0] == "linear":
            put_sn(["linear"], us)
        elif parts[0] == "embed":
            w_embed = np.asarray(state["embed.weight"], np.float32)
            put_sn(["embed"], [_l2n(u @ w_embed) for u in us])
    return params, spectral


def convert_biggan_generator(state: Dict[str, np.ndarray]
                             ) -> Tuple[Dict, Dict, Dict]:
    """BigGAN-style G state_dict (reference generators.py:756-937,
    G_shared=False / hier=False — the wiring mode that works upstream) ->
    (params, spectral, batch_stats) trees matching
    models/biggan.BigGANGenerator.

    Reference layout: ``linear`` (SNLinear), ``blocks.{i}.0`` GBlocks with
    index-mode ccbn (Embedding gain/bias) + optional ``blocks.{i}.1``
    Attention, ``output_layer.0`` plain affine bn and ``output_layer.2``
    SNConv."""
    params: Dict[str, Any] = {}
    spectral: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    def put(tree, path, value):
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = np.asarray(value, np.float32)

    u_bufs: Dict[str, list] = {}
    for name, w in state.items():
        parts = name.split(".")
        if parts[-1].startswith("u") and parts[-1][1:].isdigit():
            u_bufs.setdefault(".".join(parts[:-1]), []).append(
                (int(parts[-1][1:]), np.asarray(w, np.float32).reshape(-1)))

    # The first linear feeds the bottom_width**2 reshape: torch unflattens
    # its output CHW, this framework HWC — permute the output features.
    bw2 = None
    if "linear.weight" in state and "blocks.0.0.conv1.weight" in state:
        c0 = state["blocks.0.0.conv1.weight"].shape[1]
        bw2 = state["linear.weight"].shape[0] // c0

    def permute_out(w):
        out = w.shape[0]
        c = out // bw2
        bw = int(np.sqrt(bw2))
        return w.reshape(c, bw, bw, *w.shape[1:]).transpose(
            1, 2, 0, *range(3, w.ndim + 2)).reshape(out, *w.shape[1:])

    for name, w in state.items():
        parts = name.split(".")
        last = parts[-1]
        if last.startswith("sv") or (last.startswith("u")
                                     and last[1:].isdigit()):
            continue
        if parts[0] == "linear":
            if last == "weight":
                put(params, ["linear", "kernel"], _t_linear(permute_out(w)))
            elif last == "bias":
                put(params, ["linear", "bias"], permute_out(w))
        elif parts[0] == "blocks":
            i, j = parts[1], int(parts[2])
            mod = ("block" if j == 0 else "attn") + i
            if parts[3] == "gamma":
                put(params, [mod, "gamma"], np.asarray(w).reshape(()))
                continue
            layer = parts[3]
            if layer in ("bn1", "bn2"):
                if last == "stored_mean":
                    put(stats, [mod, layer, "mean"], w)
                elif last == "stored_var":
                    put(stats, [mod, layer, "var"], w)
                elif parts[4] == "gain" and last == "weight":
                    put(params, [mod, layer, "gain_embed"], w)
                elif parts[4] == "bias" and last == "weight":
                    put(params, [mod, layer, "bias_embed"], w)
            elif last == "weight":
                put(params, [mod, layer, "kernel"], _t_conv(w))
            elif last == "bias":
                put(params, [mod, layer, "bias"], w)
        elif parts[0] == "output_layer":
            if parts[1] == "0":
                key = {"gain": "scale", "bias": "bias",
                       "stored_mean": "mean", "stored_var": "var"}[last]
                tree = params if last in ("gain", "bias") else stats
                put(tree, ["out_bn", "bn", key], w)
            elif parts[1] == "2":
                if last == "weight":
                    put(params, ["out_conv", "kernel"], _t_conv(w))
                elif last == "bias":
                    put(params, ["out_conv", "bias"], w)

    for mod_path, us in u_bufs.items():
        us = [u for _, u in sorted(us)]
        parts = mod_path.split(".")
        if parts[0] == "linear":
            put(spectral, ["linear", "sn", "u"],
                np.stack([permute_out(u) for u in us]))
        elif parts[0] == "blocks":
            mod = ("block" if int(parts[2]) == 0 else "attn") + parts[1]
            put(spectral, [mod, parts[3], "sn", "u"], np.stack(us))
        elif parts[0] == "output_layer":
            put(spectral, ["out_conv", "sn", "u"], np.stack(us))
    return params, spectral, stats


# ---------------------------------------------------------------------------
# TF-legacy pickles (reference: stylegan2ada/legacy.py:20-297).


class _TFNetworkStub(dict):
    """Stands in for dnnlib.tflib.network.Network during unpickling; the TF
    pickle's state dict (version/static_kwargs/components/variables) lands
    here as plain dict entries."""

    def __setstate__(self, state):
        self.update(state if isinstance(state, dict) else {})

    def __getattr__(self, k):
        try:
            return self[k]
        except KeyError as e:
            raise AttributeError(k) from e


def load_tf_network_pkl(path: str):
    """Open a legacy TF pickle -> (G, D, Gs) _TFNetworkStub tuple, or None
    if the pickle is not TF-legacy (reference: legacy.py:20-71)."""

    class _TFUnpickler(pickle.Unpickler):
        def find_class(self, module, name):
            if module == "dnnlib.tflib.network" and name == "Network":
                return _TFNetworkStub
            try:
                return super().find_class(module, name)
            except (ImportError, AttributeError):
                return _Stub

    try:
        with open(path, "rb") as f:
            data = _TFUnpickler(f).load()
    except Exception:
        # not a raw pickle stream (e.g. a torch.save zip archive) -> not a
        # TF-legacy network pickle
        return None
    if (isinstance(data, tuple) and len(data) == 3
            and all(isinstance(n, _TFNetworkStub) for n in data)):
        return data
    return None


def _collect_tf_params(tf_net) -> Dict[str, np.ndarray]:
    """reference: legacy.py:75-86."""
    out: Dict[str, np.ndarray] = {}

    def recurse(prefix, net):
        for name, value in net.get("variables", []):
            out[prefix + name] = np.asarray(value)
        for name, comp in net.get("components", {}).items():
            recurse(prefix + name + "/", comp)

    recurse("", tf_net)
    return out


def convert_tf_generator(tf_G) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """TF-legacy G -> (init_kwargs, variables) for models/stylegan2.Generator
    (reference: legacy.py:109-204).  TF stores conv weights HWIO — this
    framework's native layout — so only the up-conv spatial flip and the
    dense [in, out] layout survive of the reference's transposes; mod_bias
    keeps the reference's +1 shift."""
    if int(tf_G.get("version", 0)) < 4:
        raise ValueError("TensorFlow pickle version too low")
    kw = dict(tf_G.get("static_kwargs", {}))

    def g(name, default=None, none=None):
        v = kw.get(name, default)
        return v if v is not None else none

    init_kwargs = dict(
        z_dim=g("latent_size", 512), c_dim=g("label_size", 0),
        w_dim=g("dlatent_size", 512), img_resolution=g("resolution", 1024),
        img_channels=g("num_channels", 3),
        channel_base=g("fmap_base", 16384) * 2,
        channel_max=g("fmap_max", 512),
        num_fp16_res=g("num_fp16_res", 0), conv_clamp=g("conv_clamp", None),
        architecture=g("architecture", "skip"),
        mapping_kwargs=dict(num_layers=g("mapping_layers", 8),
                            lr_multiplier=g("mapping_lrmul", 0.01),
                            w_avg_beta=g("w_avg_beta", 0.995, none=1.0)),
    )
    tf_params = _collect_tf_params(tf_G)

    params: Dict[str, Any] = {"mapping": {}, "synthesis": {}}
    moving = {"mapping": {"w_avg": np.asarray(
        tf_params["dlatent_avg"], np.float32)}}
    noise: Dict[str, Any] = {"synthesis": {}}

    def put(tree, path, value):
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = np.asarray(value, np.float32)

    nl = int(init_kwargs["mapping_kwargs"]["num_layers"])
    for i in range(nl):
        put(params, ["mapping", f"fc{i}", "weight"],
            tf_params[f"mapping/Dense{i}/weight"])        # [in, out] kept
        put(params, ["mapping", f"fc{i}", "bias"],
            tf_params[f"mapping/Dense{i}/bias"])
    if "mapping/LabelEmbed/weight" in tf_params:
        put(params, ["mapping", "embed", "weight"],
            tf_params["mapping/LabelEmbed/weight"])
        put(params, ["mapping", "embed", "bias"],
            tf_params["mapping/LabelEmbed/bias"])

    res = int(init_kwargs["img_resolution"])
    put(params, ["synthesis", "b4", "const"],
        np.transpose(tf_params["synthesis/4x4/Const/const"][0], (1, 2, 0)))

    def conv_layer(block, layer, tf_name, noise_idx, flip=False):
        w = tf_params[f"synthesis/{tf_name}/weight"]
        if flip:
            w = w[::-1, ::-1]
        base = ["synthesis", block, layer]
        put(params, base + ["weight"], w)                 # HWIO already
        put(params, base + ["bias"], tf_params[f"synthesis/{tf_name}/bias"])
        put(params, base + ["affine", "weight"],
            tf_params[f"synthesis/{tf_name}/mod_weight"])
        put(params, base + ["affine", "bias"],
            tf_params[f"synthesis/{tf_name}/mod_bias"] + 1.0)
        if noise_idx is not None:
            put(params, base + ["noise_strength"], np.asarray(
                tf_params[f"synthesis/{tf_name}/noise_strength"]).reshape(()))
            put(noise, ["synthesis", block, layer, "noise_const"],
                tf_params[f"synthesis/noise{noise_idx}"][0, 0][..., None])

    conv_layer("b4", "conv1", "4x4/Conv", 0)
    put(params, ["synthesis", "b4", "torgb", "weight"],
        tf_params["synthesis/4x4/ToRGB/weight"])
    put(params, ["synthesis", "b4", "torgb", "bias"],
        tf_params["synthesis/4x4/ToRGB/bias"])
    put(params, ["synthesis", "b4", "torgb", "affine", "weight"],
        tf_params["synthesis/4x4/ToRGB/mod_weight"])
    put(params, ["synthesis", "b4", "torgb", "affine", "bias"],
        tf_params["synthesis/4x4/ToRGB/mod_bias"] + 1.0)

    r = 8
    while r <= res:
        b = f"b{r}"
        lg = int(np.log2(r))
        conv_layer(b, "conv0", f"{r}x{r}/Conv0_up", lg * 2 - 5, flip=True)
        conv_layer(b, "conv1", f"{r}x{r}/Conv1", lg * 2 - 4)
        put(params, ["synthesis", b, "torgb", "weight"],
            tf_params[f"synthesis/{r}x{r}/ToRGB/weight"])
        put(params, ["synthesis", b, "torgb", "bias"],
            tf_params[f"synthesis/{r}x{r}/ToRGB/bias"])
        put(params, ["synthesis", b, "torgb", "affine", "weight"],
            tf_params[f"synthesis/{r}x{r}/ToRGB/mod_weight"])
        put(params, ["synthesis", b, "torgb", "affine", "bias"],
            tf_params[f"synthesis/{r}x{r}/ToRGB/mod_bias"] + 1.0)
        if f"synthesis/{r}x{r}/Skip/weight" in tf_params:
            put(params, ["synthesis", b, "skip", "weight"],
                tf_params[f"synthesis/{r}x{r}/Skip/weight"][::-1, ::-1])
        r *= 2
    return init_kwargs, {"params": params, "moving": moving, "noise": noise}


def convert_tf_discriminator(tf_D) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """TF-legacy D -> (init_kwargs, variables) for
    models/stylegan2.Discriminator (reference: legacy.py:207-274)."""
    if int(tf_D.get("version", 0)) < 4:
        raise ValueError("TensorFlow pickle version too low")
    kw = dict(tf_D.get("static_kwargs", {}))

    def g(name, default=None):
        return kw.get(name, default)

    init_kwargs = dict(
        c_dim=g("label_size", 0), img_resolution=g("resolution", 1024),
        img_channels=g("num_channels", 3),
        architecture=g("architecture", "resnet"),
        channel_base=g("fmap_base", 16384) * 2,
        channel_max=g("fmap_max", 512),
        num_fp16_res=g("num_fp16_res", 0), conv_clamp=g("conv_clamp", None),
        epilogue_kwargs=dict(mbstd_group_size=g("mbstd_group_size", None),
                             mbstd_num_channels=g("mbstd_num_features", 1)),
    )
    tf_params = _collect_tf_params(tf_D)
    res = int(init_kwargs["img_resolution"])

    params: Dict[str, Any] = {}

    def put(path, value):
        node = params
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = np.asarray(value, np.float32)

    r = res
    while r >= 8:
        b = f"b{r}"
        if f"{r}x{r}/FromRGB/weight" in tf_params:
            put([b, "fromrgb", "weight"], tf_params[f"{r}x{r}/FromRGB/weight"])
            put([b, "fromrgb", "bias"], tf_params[f"{r}x{r}/FromRGB/bias"])
        put([b, "conv0", "weight"], tf_params[f"{r}x{r}/Conv0/weight"])
        put([b, "conv0", "bias"], tf_params[f"{r}x{r}/Conv0/bias"])
        put([b, "conv1", "weight"], tf_params[f"{r}x{r}/Conv1_down/weight"])
        put([b, "conv1", "bias"], tf_params[f"{r}x{r}/Conv1_down/bias"])
        if f"{r}x{r}/Skip/weight" in tf_params:
            put([b, "skip", "weight"], tf_params[f"{r}x{r}/Skip/weight"])
        r //= 2
    put(["b4", "conv", "weight"], tf_params["4x4/Conv/weight"])
    put(["b4", "conv", "bias"], tf_params["4x4/Conv/bias"])
    # TF flattens CHW before Dense0; this framework flattens HWC.
    w = np.asarray(tf_params["4x4/Dense0/weight"])        # [in, out]
    in_f, out_f = w.shape
    c = in_f // 16
    put(["b4", "fc", "weight"],
        np.transpose(w.reshape(c, 4, 4, out_f), (1, 2, 0, 3)).reshape(
            in_f, out_f))
    put(["b4", "fc", "bias"], tf_params["4x4/Dense0/bias"])
    put(["b4", "out", "weight"], tf_params["Output/weight"])
    put(["b4", "out", "bias"], tf_params["Output/bias"])
    if "LabelEmbed/weight" in tf_params:
        put(["mapping", "embed", "weight"], tf_params["LabelEmbed/weight"])
        put(["mapping", "embed", "bias"], tf_params["LabelEmbed/bias"])
    i = 0
    while f"Mapping{i}/weight" in tf_params:
        put(["mapping", f"fc{i}", "weight"], tf_params[f"Mapping{i}/weight"])
        put(["mapping", f"fc{i}", "bias"], tf_params[f"Mapping{i}/bias"])
        i += 1
    return init_kwargs, {"params": params}


def import_generator_pickle(path: str, key: str = "G_ema"):
    """Load a reference pickle (torch-persistence OR TF-legacy) and return
    (registry_name, init_kwargs, variables).  SG2 and BigGAN generators are
    auto-detected (class name when a persistence meta carries one, state
    layout otherwise)."""
    tf_nets = load_tf_network_pkl(path)
    if tf_nets is not None:
        tf_G, _tf_D, tf_Gs = tf_nets
        kw, variables = convert_tf_generator(tf_Gs if key in ("G_ema", "Gs")
                                             else tf_G)
        return "sg2_classic", kw, variables
    data = load_reference_pickle(path)
    meta = data[key]
    cname = ""
    if isinstance(meta, dict):
        cname = str(meta.get("class_name", "") or
                    meta.get("state", {}).get("class_name", ""))
    else:
        cname = type(meta).__name__
    if isinstance(meta, dict) and "init_kwargs" in meta.get("state", {}):
        init_kwargs = dict(meta["state"]["init_kwargs"])
    elif isinstance(meta, dict):
        init_kwargs = dict(meta.get("init_kwargs", {}))
    else:
        init_kwargs = {}
    state = torch_state_to_numpy(meta)
    is_biggan = ("biggan" in cname.lower().replace("_", "") or
                 any(k.startswith("blocks.") for k in state))
    if is_biggan:
        params, spectral, stats = convert_biggan_generator(state)
        variables = {"params": params, "spectral": spectral,
                     "batch_stats": stats}
        return "big_gan", init_kwargs, variables
    params, moving, noise = convert_sg2_generator(state)
    variables = {"params": params, "moving": moving, "noise": noise}
    return "sg2_classic", init_kwargs, variables


def import_discriminator_pickle(path: str, key: str = "D"):
    """Load the discriminator from a reference pickle -> variables dict
    ({'params': ...} plus SN/BN state collections), or None when the pickle
    has no D (e.g. inference-only exports)."""
    tf_nets = load_tf_network_pkl(path)
    if tf_nets is not None:
        _tf_G, tf_D, _tf_Gs = tf_nets
        if tf_D is None:
            return None
        _kw, variables = convert_tf_discriminator(tf_D)
        return variables
    data = load_reference_pickle(path)
    meta = data.get(key)
    if meta is None:
        return None
    state = torch_state_to_numpy(meta)
    if any(k.startswith("blocks.") for k in state):
        params, spectral = convert_biggan_discriminator(state)
        return {"params": params, "spectral": spectral}
    return {"params": convert_sg2_discriminator(state)}


# --------------------------------------------------------------------- CLI

_GEN_FIELDS = ("z_dim", "w_dim", "c_dim", "img_resolution", "img_channels",
               "channel_base", "channel_max", "num_fp16_res", "conv_clamp",
               "architecture", "attentions", "mapping_kwargs")
_MAPPING_FIELDS = ("num_layers", "embed_features", "layer_features",
                   "activation", "lr_multiplier", "w_avg_beta")
_BIGGAN_FIELDS = ("G_ch", "z_dim", "c_dim", "img_resolution", "img_channels",
                  "bottom_width", "G_attn", "n_classes", "G_shared",
                  "shared_dim", "hier", "G_param")


def normalize_generator_kwargs(init_kwargs: Dict[str, Any]) -> Dict[str, Any]:
    """Reference Generator init kwargs -> models/stylegan2.Generator kwargs.

    The reference nests channel/precision settings under synthesis_kwargs
    (reference generators.py:533-563); this framework's ctor takes them at
    the top level.  Unknown keys are dropped with a notice so pickles from
    forked reference variants still import."""
    kw = dict(init_kwargs or {})
    synth = dict(kw.pop("synthesis_kwargs", None) or {})
    for k in ("channel_base", "channel_max", "num_fp16_res", "conv_clamp",
              "architecture", "attentions"):
        if k in synth and k not in kw:
            kw[k] = synth[k]
    mapping = dict(kw.get("mapping_kwargs", None) or {})
    dropped_m = sorted(set(mapping) - set(_MAPPING_FIELDS))
    kw["mapping_kwargs"] = {k: v for k, v in mapping.items()
                            if k in _MAPPING_FIELDS}
    dropped = sorted(set(kw) - set(_GEN_FIELDS))
    out = {k: v for k, v in kw.items() if k in _GEN_FIELDS}
    if dropped or dropped_m:
        print(f"import: dropped unsupported kwargs {dropped} "
              f"mapping={dropped_m}")
    return out


def build_import_payload(src: str, key: str = "G_ema"):
    """Convert a reference pickle into (gen_name, init_kwargs, common,
    payload) — the checkpoint pytree setup_networks / tools/loader.py
    consume.  Includes the live G and D when the pickle carries them, so
    `trans.resume=<snapshot>` continues training from a reference
    checkpoint (reference: trainers.py:342-369)."""
    gen_name, init_kwargs, variables = import_generator_pickle(src, key=key)
    if gen_name == "big_gan":
        dropped = sorted(set(init_kwargs) - set(_BIGGAN_FIELDS))
        kw = {k: v for k, v in init_kwargs.items() if k in _BIGGAN_FIELDS}
        if dropped:
            print(f"import: dropped unsupported kwargs {dropped}")
    else:
        kw = normalize_generator_kwargs(init_kwargs)
    common = {k: int(kw.pop(k)) for k in
              ("c_dim", "img_resolution", "img_channels") if k in kw}

    params = variables.pop("params")
    payload = dict(params_g_ema=params, g_state_ema=variables,
                   params_g=params, g_state=variables)
    try:
        _, _, g_live = import_generator_pickle(src, key="G")
        payload["params_g"] = g_live.pop("params")
        payload["g_state"] = g_live
    except Exception:
        pass    # inference-only export: G_ema doubles as the live G
    try:
        d_vars = import_discriminator_pickle(src)
        if d_vars is not None:
            payload["params_d"] = d_vars.pop("params")
            payload["d_state"] = d_vars
    except Exception as e:
        print(f"import: no discriminator imported ({e})")
    return gen_name, kw, common, payload


def import_pickle_to_checkpoint(src: str, out_path: str,
                                key: str = "G_ema") -> str:
    """One-file conversion used by the resume-spec resolver
    (utils/resolver.py): reference .pkl -> native .msgpack checkpoint."""
    from style_big_gan_tpu.utils import checkpoint as ckpt

    _, _, _, payload = build_import_payload(src, key=key)
    ckpt.save_pytree(out_path, payload)
    return out_path


def main():
    """Convert a reference network pickle into a run directory this
    framework's tools (generate/style_mixing/projector/calc_metrics) load
    directly: training_options.json + network-snapshot-000000.msgpack
    (reference legacy.py as a standalone converter)."""
    import argparse
    import os

    from style_big_gan_tpu.utils import checkpoint as ckpt

    p = argparse.ArgumentParser(description=main.__doc__)
    p.add_argument("--src", required=True,
                   help="reference .pkl (torch-persistence or TF-legacy)")
    p.add_argument("--out-dir", required=True)
    p.add_argument("--key", default="G_ema",
                   help="which network to import (G_ema, G)")
    args = p.parse_args()

    gen_name, kw, common, payload = build_import_payload(args.src,
                                                         key=args.key)
    os.makedirs(args.out_dir, exist_ok=True)
    snap = os.path.join(args.out_dir, "network-snapshot-000000.msgpack")
    ckpt.save_pytree(snap, payload)
    opts = {
        "gen": {"generator": gen_name},
        "gens_args": {gen_name: kw},
        "data": {"dataset": "image_folder"},
        "datasets_args": {"image_folder": {}},
        "model_meta": {
            "label_dim": common.get("c_dim", 0),
            "resolution": common.get("img_resolution", 0),
            "img_channels": common.get("img_channels", 3),
        },
        "imported_from": os.path.abspath(args.src),
    }
    ckpt.save_json(os.path.join(args.out_dir, "training_options.json"), opts)
    print(f"imported {args.src} ({args.key}) -> {snap}")


if __name__ == "__main__":
    main()
