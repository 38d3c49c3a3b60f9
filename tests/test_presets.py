"""exp.preset — the reference cfg-spec resolver (utils/presets.py).

Reference being matched: stylegan2ada/train.py:146-195 (`cfg_specs` table,
`auto` heuristics, cifar special-casing).
"""

import io
import json
import os
import zipfile

import numpy as np
import pytest

from style_big_gan_tpu import registries
from style_big_gan_tpu.arguments import load_config
from style_big_gan_tpu.utils.presets import (PRESET_SPECS, apply_preset,
                                             resolve_spec)

registries._import_all()

CFG_DIR = os.path.join(os.path.dirname(__file__), "..", "configs")


def _yaml(name):
    return os.path.join(CFG_DIR, name)


def test_paper256_preset_matches_reference_spec():
    c = load_config(["exp.name=t", "exp.preset=paper256"],
                    yaml_path=_yaml("sg2ada.yaml"))
    assert int(c.gen.batch) == 64
    assert int(c.gen.batch_device) == 8          # mb 64 / ref_gpus 8
    assert int(c.gens_args.sg2_classic.channel_base) == 16384   # fmaps 0.5
    assert int(c.discs_args.sg2_classic.channel_base) == 16384
    assert int(c.gens_args.sg2_classic.mapping_kwargs.num_layers) == 8
    assert int(c.discs_args.sg2_classic.epilogue_kwargs.mbstd_group_size) == 8
    assert float(c.optim_gen_args.adam.lr) == 0.0025
    assert float(c.disc_regs_all.r1.r1_gamma) == 1.0
    assert float(c.ema.kimg) == 20.0
    assert float(c.ema.ramp) == -1.0             # paper presets: no rampup
    assert c.gen.gen_regs == ["ppl"] and c.gen.disc_regs == ["r1"]


def test_paper1024_and_stylegan2_specs():
    c = load_config(["exp.name=t", "exp.preset=paper1024"],
                    yaml_path=_yaml("sg2ada.yaml"))
    assert int(c.gen.batch) == 32
    assert float(c.optim_gen_args.adam.lr) == 0.002
    assert float(c.disc_regs_all.r1.r1_gamma) == 2.0
    assert int(c.gens_args.sg2_classic.channel_base) == 32768   # fmaps 1

    c = load_config(["exp.name=t", "exp.preset=stylegan2"],
                    yaml_path=_yaml("sg2ada.yaml"))
    assert float(c.disc_regs_all.r1.r1_gamma) == 10.0
    assert int(c.discs_args.sg2_classic.epilogue_kwargs.mbstd_group_size) == 4


def test_cifar_preset_disables_ppl_and_mixing():
    c = load_config(["exp.name=t", "exp.preset=cifar"],
                    yaml_path=_yaml("sg2ada.yaml"))
    assert c.gen.gen_regs == []                  # pl_weight 0 (train.py:193)
    assert float(c.losses_arch_args.sg2.style_mixing_prob) == 0.0
    assert c.discs_args.sg2_classic.architecture == "orig"
    assert int(c.gen.kimg) == 100000
    assert float(c.disc_regs_all.r1.r1_gamma) == 0.01


def test_auto_spec_reference_formulas():
    # 256px on 8 devices: mb = max(min(8*min(16,32),64),8) = 64; mbstd 4;
    # fmaps 0.5; lr 0.0025; gamma 0.0002*256^2/64 = 0.2048; ema 20.
    s = resolve_spec("auto", resolution=256, devices=8)
    assert s["mb"] == 64 and s["mbstd"] == 4
    assert s["fmaps"] == 0.5 and s["lrate"] == 0.0025
    assert abs(s["gamma"] - 0.2048) < 1e-9
    assert s["ema"] == 20.0
    # 1024px on 8 devices: min(4096//1024,32)=4 -> mb 32; fmaps 1; lr 0.002.
    s = resolve_spec("auto", resolution=1024, devices=8)
    assert s["mb"] == 32 and s["fmaps"] == 1.0 and s["lrate"] == 0.002
    assert abs(s["gamma"] - 0.0002 * 1024**2 / 32) < 1e-9
    # 1 device keeps mb >= devices.
    s = resolve_spec("auto", resolution=4096, devices=1)
    assert s["mb"] == 1


def test_cli_overrides_beat_preset():
    c = load_config(["exp.name=t", "exp.preset=paper256", "gen.batch=16",
                     "disc_regs_all.r1.r1_gamma=7.5"],
                    yaml_path=_yaml("sg2ada.yaml"))
    assert int(c.gen.batch) == 16
    assert float(c.disc_regs_all.r1.r1_gamma) == 7.5
    # Non-overridden preset values still applied.
    assert int(c.gens_args.sg2_classic.channel_base) == 16384


def test_auto_preset_probes_dataset_resolution(tmp_path):
    import PIL.Image
    path = tmp_path / "tiny64.zip"
    rnd = np.random.RandomState(0)
    with zipfile.ZipFile(path, "w") as z:
        for i in range(4):
            img = (rnd.rand(64, 64, 3) * 255).astype("uint8")
            buf = io.BytesIO()
            PIL.Image.fromarray(img).save(buf, format="png")
            z.writestr(f"img{i:05d}.png", buf.getvalue())
    c = load_config(["exp.name=t", "exp.preset=auto",
                     f"data.dataset_path={path}", "perf.devices=8"],
                    yaml_path=_yaml("sg2ada.yaml"))
    # 64px, 8 devices: mb = max(min(8*32, 64), 8) = 64; gamma formula at 64px.
    assert int(c.gen.batch) == 64
    assert abs(float(c.disc_regs_all.r1.r1_gamma) -
               0.0002 * 64**2 / 64) < 1e-9


def test_unknown_preset_raises():
    with pytest.raises(ValueError, match="unknown exp.preset"):
        resolve_spec("nope")
    assert set(PRESET_SPECS) == {"auto", "stylegan2", "paper256", "paper512",
                                 "paper1024", "cifar"}
