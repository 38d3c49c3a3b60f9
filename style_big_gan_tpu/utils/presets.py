"""`exp.preset` — the reference's `cfg=` base-config specs, resolved TPU-side.

The reference's vendored entry point auto-derives batch / R1-gamma / EMA /
learning rate / width from the dataset resolution and device count
(reference: stylegan2ada/train.py:146-190, `cfg_specs`).  This module ports
that table and the `auto` heuristics onto this build's config schema so

    sbg-train exp.config=sg2ada.yaml exp.preset=auto data.dataset_path=...

fills in a sane recipe for any resolution/device count.  Precedence inside
``load_config``: structured defaults < YAML < preset < CLI dotlist — a preset
is a *base recipe* layered over the YAML, and explicit CLI overrides always
win (same spirit as the reference, where `--gamma/--kimg/--batch` override
the chosen spec, train.py:196-218).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

# reference train.py:154-161 verbatim semantics.  ref_gpus=-1/mb=-1/...
# mark the dynamically-populated `auto` spec.
PRESET_SPECS: Dict[str, Dict[str, Any]] = {
    "auto":      dict(ref_gpus=-1, kimg=25000, mb=-1, mbstd=-1, fmaps=-1.0,
                      lrate=-1.0, gamma=-1.0, ema=-1.0, ramp=0.05, map=2),
    "stylegan2": dict(ref_gpus=8, kimg=25000, mb=32, mbstd=4, fmaps=1.0,
                      lrate=0.002, gamma=10.0, ema=10.0, ramp=None, map=8),
    "paper256":  dict(ref_gpus=8, kimg=25000, mb=64, mbstd=8, fmaps=0.5,
                      lrate=0.0025, gamma=1.0, ema=20.0, ramp=None, map=8),
    "paper512":  dict(ref_gpus=8, kimg=25000, mb=64, mbstd=8, fmaps=1.0,
                      lrate=0.0025, gamma=0.5, ema=20.0, ramp=None, map=8),
    "paper1024": dict(ref_gpus=8, kimg=25000, mb=32, mbstd=4, fmaps=1.0,
                      lrate=0.002, gamma=2.0, ema=10.0, ramp=None, map=8),
    "cifar":     dict(ref_gpus=2, kimg=100000, mb=64, mbstd=32, fmaps=1.0,
                      lrate=0.0025, gamma=0.01, ema=500.0, ramp=0.05, map=2),
}


def resolve_spec(preset: str, resolution: Optional[int] = None,
                 devices: Optional[int] = None) -> Dict[str, Any]:
    """Return the fully-populated spec dict for ``preset``.

    ``auto`` needs the dataset ``resolution`` and the ``devices`` count (its
    stand-in for the reference's GPU count, train.py:166-176)."""
    if preset not in PRESET_SPECS:
        raise ValueError(f"unknown exp.preset '{preset}'; valid: "
                         f"{sorted(PRESET_SPECS)}")
    spec = dict(PRESET_SPECS[preset])
    if preset == "auto":
        if not resolution or not devices:
            raise ValueError("exp.preset=auto needs the dataset resolution "
                             "and device count to derive the recipe")
        res, n = int(resolution), int(devices)
        spec["ref_gpus"] = n
        # reference train.py:169-175, chip-for-gpu.
        spec["mb"] = max(min(n * min(4096 // res, 32), 64), n)
        spec["mbstd"] = min(spec["mb"] // n, 4)
        spec["fmaps"] = 1.0 if res >= 512 else 0.5
        spec["lrate"] = 0.002 if res >= 1024 else 0.0025
        spec["gamma"] = 0.0002 * (res ** 2) / spec["mb"]
        spec["ema"] = spec["mb"] * 10 / 32
    return spec


def _probe_resolution(config) -> int:
    """Instantiate the configured dataset once to read its resolution (the
    trainer does the same probe later, reference trainers.py:234-240)."""
    from style_big_gan_tpu import registries
    registries._import_all()
    ds_name = str(config.data.dataset)
    kwargs = dict(config.datasets_args[ds_name])
    kwargs["path"] = str(config.data.dataset_path)
    ds = registries.datasets[ds_name](**kwargs)
    return int(ds.resolution)


def apply_preset(config, preset: Optional[str] = None,
                 resolution: Optional[int] = None,
                 devices: Optional[int] = None):
    """Overlay the preset's derived values onto ``config`` (in place).

    Only SG2-family keys are touched — presets describe the StyleGAN2-ADA
    recipe ladder; other families keep their YAML recipes."""
    preset = preset if preset is not None else str(
        getattr(config.exp, "preset", "") or "")
    if not preset:
        return config
    if preset == "auto":
        if resolution is None:
            resolution = _probe_resolution(config)
        if devices is None:
            d = int(getattr(config.perf, "devices", -1))
            if d > 0:
                devices = d
            else:
                import jax
                devices = jax.device_count()
    spec = resolve_spec(preset, resolution=resolution, devices=devices)

    g = config.gen
    g.kimg = int(spec["kimg"])
    g.batch = int(spec["mb"])
    g.batch_device = max(1, int(spec["mb"]) // int(spec["ref_gpus"]))
    g.generator = "sg2_classic"
    g.discriminator = "sg2_classic"
    g.loss_arch = "sg2"
    g.loss = "softplus"
    g.gen_regs = ["ppl"]
    g.disc_regs = ["r1"]
    g.g_reg_interval = 4
    g.d_reg_interval = 16
    config.exp.trainer = "sg2"

    channel_base = int(spec["fmaps"] * 32768)
    for side in ("gens_args", "discs_args"):
        grp = config[side]["sg2_classic"]
        grp.channel_base = channel_base
        grp.channel_max = 512
        grp.num_fp16_res = 4       # bf16 blocks on TPU (train.py:181)
        grp.conv_clamp = 256
    config.gens_args.sg2_classic.mapping_kwargs.num_layers = int(spec["map"])
    config.discs_args.sg2_classic.epilogue_kwargs.mbstd_group_size = \
        int(spec["mbstd"])

    for opt in ("optim_gen_args", "optim_disc_args"):
        config[opt]["adam"].lr = float(spec["lrate"])
        config[opt]["adam"].betas = [0.0, 0.99]
    config.disc_regs_all.r1.r1_gamma = float(spec["gamma"])
    config.ema.kimg = float(spec["ema"])
    config.ema.ramp = -1.0 if spec["ramp"] is None else float(spec["ramp"])

    if preset == "cifar":
        # reference train.py:192-195: PPL off, no style mixing, orig D arch.
        g.gen_regs = []
        config.losses_arch_args.sg2.style_mixing_prob = 0.0
        config.discs_args.sg2_classic.architecture = "orig"
    return config
