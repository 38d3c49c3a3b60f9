"""Config schema + loading: structured defaults -> YAML -> CLI dotlist.

Keeps the reference's config UX (reference: arguments.py:19-158) — same group
names (``exp/data/log/gen/perf/ema/aug/trans`` + auto-derived per-registry
groups), same precedence (CLI wins over YAML wins over defaults) — so
reference YAML configs port with minimal edits.  TPU adaptations:

* ``perf`` speaks TPU: ``bf16`` instead of tf32/cudnn-bench flags, a device
  ``mesh`` spec instead of ``gpus``.
* augmentation presets (``blit``/``geom``/.../``bgc``/``bgcfnc``) are properly
  registered config groups (fixing the reference quirk where the presets only
  lived in the vendored train.py:271-283).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import Any, List, Optional

from style_big_gan_tpu import registries
from style_big_gan_tpu.utils import conf
from style_big_gan_tpu.utils.conf import MISSING
from style_big_gan_tpu.utils.registry import (ClassRegistry,
                                              make_dataclass_from_classes)

args = ClassRegistry()


@args.add_to_registry("exp")
@dataclass
class ExperimentArgs:
    config_dir: str = MISSING
    config: str = MISSING
    name: str = MISSING
    project: str = "style-big-gan-tpu"
    notes: str = "empty notes"
    dry_run: bool = False
    trainer: str = "base"
    # SG2 recipe preset layered over the YAML (reference train.py:146-190
    # `cfg=` specs): '' (off) | auto | stylegan2 | paper256 | paper512 |
    # paper1024 | cifar.  'auto' derives batch/gamma/EMA/width from the
    # dataset resolution and device count.  CLI overrides still win.
    preset: str = ""


@args.add_to_registry("data")
@dataclass
class DataArgs:
    dataset: str = "image_folder"
    # 'auto' = the C++ pipeline (native/dataio.cpp) when its shared library
    # is built, else the Python threaded loader.  Set 'basic'/'native'
    # explicitly to pin one.
    dataloader: str = "auto"
    dataset_path: str = "./data"
    cond: bool = False
    subset: int = 0
    mirror: bool = False


@args.add_to_registry("log")
@dataclass
class LogArgs:
    snap: int = 50
    output: str = "./outputs"
    metrics: List[str] = field(default_factory=lambda: ["fid50k_full", "is50k"])
    kimg_per_tick: int = 4
    wandb: bool = False
    tensorboard: bool = False
    sample_grid: List[int] = field(default_factory=lambda: [0, 0])  # 0 = auto
    # Metric feature detector for training-time evaluation: 'fake_v1' is a
    # deterministic random-conv stand-in (NOT a perceptual metric; for smoke
    # runs / environments without weights).  'inception_v3_jax' +
    # detector_path=<converted .npz> gives real FID numbers
    # (tools/convert_detector.py).
    detector: str = "fake_v1"
    detector_path: str = ""


@args.add_to_registry("gen")
@dataclass
class GenArgs:
    kimg: int = -1
    batch: int = -1
    batch_device: int = 32       # per-device microbatch (reference batch_gpu)
    seed: int = 0
    generator: str = "sg2_classic"
    discriminator: str = "sg2_classic"
    optim_gen: str = "adam"
    optim_disc: str = "adam"
    gen_regs: List[str] = field(default_factory=list)
    disc_regs: List[str] = field(default_factory=list)
    loss_arch: str = "sg2"
    loss: str = "softplus"
    g_reg_interval: int = 16
    d_reg_interval: int = 4
    n_dis: int = 1


@args.add_to_registry("perf")
@dataclass
class PerfArgs:
    bf16: bool = True            # compute dtype for conv/matmul heavy blocks
    num_fp16_res: int = 4        # how many top resolutions run in low precision
    devices: int = -1            # -1 -> all visible devices
    data_axis: str = "data"      # mesh axis for batch sharding
    model_axis: str = "model"    # mesh axis for weight sharding (tensor parallel)
    model_parallel: int = 1      # size of the model axis (EXPERIMENTAL:
    # equality-tested on the CPU mesh, unbenchmarked on real multi-chip
    # hardware — see docs/parallelism.md "Tensor parallelism status")
    use_pallas: bool = True      # pallas kernels where available (else pure XLA)
    donate: bool = False         # donate state buffers into jitted steps
    # (off by default: the axon-tunneled TPU backend rejects full-state
    #  donation at runtime; flip on for memory savings on standard backends)
    remat: bool = False          # jax.checkpoint the synthesis blocks
    trace_dir: str = ""          # capture a jax.profiler trace (batches 10-20)
    # Batches per dispatch: >1 scans [Dmain+Gmain] for k batches inside ONE
    # TPU program (MaxText-style steps-per-loop), removing per-dispatch
    # tunnel latency (~16% of the 256px iteration).  Requires n_dis == 1;
    # lazy regs fire per schedule as separate dispatches (Greg fuses into
    # the cycle tail when g_reg_interval == k).  Ignored (with a warning)
    # when the schedule is incompatible.
    steps_per_dispatch: int = 1


@args.add_to_registry("ema")
@dataclass
class EmaArgs:
    use_ema: bool = True
    kimg: float = 20.0
    ramp: float = -1.0
    # BigGAN eval-time standing statistics: before each snapshot eval,
    # re-accumulate BN standing stats over `standing_stats_batches`
    # train-mode G_ema forwards (reference myBN accumulate_standing,
    # biggan/layers.py:212-255, exposed at generators.py:762,791-793).
    standing_stats: bool = False
    standing_stats_batches: int = 16


@args.add_to_registry("aug")
@dataclass
class AugArgs:
    aug: str = "ada"             # 'noaug' | 'ada' | 'fixed'
    aug_type: str = "sg2_ada"
    p: float = -1.0
    target: float = -1.0
    augpipe: str = "bgc"
    ada_interval: int = 4
    ada_kimg: int = 500


@args.add_to_registry("trans")
@dataclass
class TransferArgs:
    resume: str = "noresume"     # 'noresume' | 'from_data' | preset name | path
    resume_url: str = ""
    freezed: int = -1
    resume_model: str = ""
    resume_dir: str = ""
    args_name: str = "training_options.json"


_ARGS_CLASS = None


def build_args_class():
    """Assemble the full Args dataclass, including the auto-derived groups.

    Mirrors reference arguments.py:112-143: each registry contributes a group
    whose sub-groups are derived from registered-class ``__init__`` signatures.
    """
    global _ARGS_CLASS
    if _ARGS_CLASS is not None:
        return _ARGS_CLASS
    registries._import_all()
    groups = dict(args.args_schema)
    # Hand-written groups above were registered as dataclasses directly; the
    # registry derived their schema from __init__, which for a dataclass is
    # exactly its fields, so groups is already correct for them.
    groups["datasets_args"] = registries.datasets.make_schema("DatasetsArgs")
    groups["dataloaders_args"] = registries.dataloaders.make_schema("DataloadersArgs")
    groups["gens_args"] = registries.generators.make_schema("GensArgs")
    groups["discs_args"] = registries.discriminators.make_schema("DiscsArgs")
    groups["optim_gen_args"] = registries.optimizers.make_schema("OptimGenArgs")
    groups["optim_disc_args"] = registries.optimizers.make_schema("OptimDiscArgs")
    groups["losses_arch_args"] = registries.losses_arch.make_schema("LossesArchArgs")
    groups["augpipe_specs"] = registries.augmentations.make_schema("AugpipeSpecs")
    groups["gen_regs_all"] = registries.generator_regs.make_schema("GenRegsAll")
    groups["disc_regs_all"] = registries.discriminator_regs.make_schema("DiscRegsAll")
    _ARGS_CLASS = make_dataclass_from_classes(groups, "Args")
    return _ARGS_CLASS


def default_config():
    """Structured config with every default filled in."""
    return conf.structured(build_args_class())


def load_config(argv: Optional[List[str]] = None, yaml_path: Optional[str] = None):
    """structured defaults -> YAML file -> CLI dotlist (reference:
    arguments.py:146-158).  ``argv``/``yaml_path`` allow programmatic use."""
    import sys
    config = default_config()
    if argv is None:
        argv = sys.argv[1:]
    conf_cli = conf.from_dotlist(argv)

    if yaml_path is None:
        config.exp.config = conf_cli.exp.config
        # exp.config_dir defaults to the shipped configs/ directory so the
        # installed package works from any CWD (utils/paths.py); an explicit
        # CLI value always wins.
        cli_dir = getattr(conf_cli, "exp", conf.ConfigNode()).get("config_dir",
                                                                  MISSING)
        if cli_dir is MISSING or cli_dir == MISSING:
            from style_big_gan_tpu.utils.paths import default_config_dir
            config.exp.config_dir = default_config_dir()
        else:
            config.exp.config_dir = cli_dir
        yaml_path = os.path.join(str(config.exp.config_dir), str(config.exp.config))
    conf_file = conf.load(yaml_path)
    config = conf.merge(config, conf_file)
    # exp.preset (YAML or CLI) layers the reference's cfg-spec recipe over
    # the YAML before the CLI dotlist merges, so explicit CLI values win
    # over the preset (utils/presets.py; reference train.py:146-190).
    preset = str(conf_cli.get("exp", {}).get("preset", "") or
                 config.exp.get("preset", "") or "")
    if preset and preset != str(MISSING):
        from style_big_gan_tpu.utils.presets import apply_preset
        # A CLI-supplied dataset path must be visible to the auto probe.
        cli_path = conf_cli.get("data", {}).get("dataset_path")
        if cli_path:
            config.data.dataset_path = cli_path
        apply_preset(config, preset=preset)
        config.exp.preset = preset
    config = conf.merge(config, conf_cli)
    return config
