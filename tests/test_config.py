"""Config system tests: registry auto-schema, merge precedence, dotlist."""

import dataclasses
import os

import pytest

from style_big_gan_tpu.utils import conf
from style_big_gan_tpu.utils.registry import (ClassRegistry,
                                              make_dataclass_from_init)


def test_registry_schema_from_signature():
    reg = ClassRegistry()

    @reg.add_to_registry("thing")
    class Thing:
        def __init__(self, a=1, b="x", c=None, d=(1, 2), required=None,
                     flags={"k": True}):
            pass

    schema = reg.args_schema["thing"]
    inst = schema()
    assert inst.a == 1 and inst.b == "x"
    assert inst.d == [1, 2]
    assert inst.flags == {"k": True}
    # two instances don't share mutable defaults
    inst2 = schema()
    inst2.flags["k"] = False
    assert inst.flags["k"] is True


def test_registry_missing_required():
    reg = ClassRegistry()

    @reg.add_to_registry("m")
    class M:
        def __init__(self, path, n=3):
            pass

    inst = reg.args_schema["m"]()
    assert inst.path == conf.MISSING
    assert inst.n == 3


def test_registry_duplicate_raises():
    reg = ClassRegistry()

    @reg.add_to_registry("x")
    class A:
        def __init__(self):
            pass

    with pytest.raises(KeyError):
        @reg.add_to_registry("x")
        class B:
            def __init__(self):
                pass


def test_conf_merge_precedence(tmp_path):
    base = conf.structured(dataclasses.make_dataclass(
        "S", [("a", int, 1), ("b", str, "base")]))
    yaml_path = tmp_path / "c.yaml"
    yaml_path.write_text("b: from_yaml\nnested:\n  x: 2\n")
    merged = conf.merge(base, conf.load(str(yaml_path)),
                        conf.from_dotlist(["b=from_cli", "nested.x=5"]))
    assert merged.a == 1
    assert merged.b == "from_cli"
    assert merged.nested.x == 5


def test_dotlist_value_parsing():
    c = conf.from_dotlist(["a.b=1", "a.c=2.5", "d=[1,2]", "e=true", "f=text",
                           "g=null"])
    assert c.a.b == 1 and isinstance(c.a.b, int)
    assert c.a.c == 2.5
    assert c.d == [1, 2]
    assert c.e is True
    assert c.f == "text"
    assert c.g is None


def test_full_args_schema_builds():
    from style_big_gan_tpu.arguments import default_config
    cfg = default_config()
    for group in ["exp", "data", "log", "gen", "perf", "ema", "aug", "trans",
                  "datasets_args", "gens_args", "discs_args",
                  "optim_gen_args", "optim_disc_args", "losses_arch_args",
                  "augpipe_specs", "gen_regs_all", "disc_regs_all"]:
        assert group in cfg, group
    assert cfg.gen.batch == -1
    assert cfg.gens_args.sg2_classic.z_dim == 512
    assert cfg.disc_regs_all.r1.r1_gamma == 10.0
    assert cfg.gen_regs_all.ppl.pl_weight == 2.0
    assert cfg.optim_gen_args.adam.betas == [0.0, 0.99]


def test_load_config_yaml_and_cli(tmp_path):
    from style_big_gan_tpu.arguments import load_config
    y = tmp_path / "t.yaml"
    y.write_text("gen:\n    batch: 32\n    loss: 'hinge'\n")
    cfg = load_config(argv=["gen.batch=64", "exp.name=t"],
                      yaml_path=str(y))
    assert cfg.gen.batch == 64        # CLI wins
    assert cfg.gen.loss == "hinge"    # YAML wins over default
    assert cfg.exp.name == "t"


def test_shipped_configs_load():
    from style_big_gan_tpu.arguments import load_config
    cfg_dir = os.path.join(os.path.dirname(__file__), "..", "configs")
    for name in os.listdir(cfg_dir):
        cfg = load_config(argv=["exp.name=x"],
                          yaml_path=os.path.join(cfg_dir, name))
        assert cfg.gen.batch > 0, name
