"""Packaging smoke: the repo installs and its entry points resolve.

The reference ships requirements.txt only (/root/reference/requirements.txt);
this build is a real package (pyproject.toml): `pip install -e .` exposes the
``sbg-train`` console script and ``python -m style_big_gan_tpu.tools.*``
from any CWD, with exp.config_dir defaulting to the shipped configs/.
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_pyproject_version_matches_package():
    import style_big_gan_tpu
    text = open(os.path.join(REPO, "pyproject.toml")).read()
    assert 'attr = "style_big_gan_tpu.__version__"' in text
    assert style_big_gan_tpu.__version__


def test_default_config_dir_points_at_shipped_configs():
    from style_big_gan_tpu.utils.paths import default_config_dir
    d = default_config_dir()
    assert os.path.isfile(os.path.join(d, "dcgan.yaml"))


def test_load_config_defaults_config_dir(tmp_path):
    """From any CWD, exp.config alone finds the shipped recipe."""
    from style_big_gan_tpu.arguments import load_config
    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        c = load_config(["exp.config=dcgan.yaml", "exp.name=t"])
        assert int(c.gen.batch) == 128  # dcgan.yaml's value, so it loaded
        assert os.path.isabs(str(c.exp.config_dir))
        c2 = load_config(["exp.config_dir=" + os.path.join(REPO, "configs"),
                          "exp.config=dcgan.yaml", "exp.name=t"])
        assert str(c2.exp.config_dir).startswith(REPO)
    finally:
        os.chdir(cwd)


def test_console_entry_point_importable():
    from style_big_gan_tpu.starter import main
    assert callable(main)


def test_tools_run_as_modules_from_any_cwd(tmp_path):
    """python -m style_big_gan_tpu.tools.generate --help works outside the
    repo root (editable install puts the package on sys.path; for a source
    checkout PYTHONPATH supplies it, as for this test run)."""
    env = dict(os.environ, SBG_PLATFORM="cpu", JAX_PLATFORMS="cpu",
               PYTHONPATH=REPO + os.pathsep + os.environ.get("PYTHONPATH", ""))
    proc = subprocess.run(
        [sys.executable, "-m", "style_big_gan_tpu.tools.generate", "--help"],
        cwd=tmp_path, capture_output=True, text=True, env=env, timeout=120)
    assert proc.returncode == 0, proc.stderr
    assert "usage" in (proc.stdout + proc.stderr).lower()


def test_editable_install_metadata_present_or_installable():
    """If the package is already installed (editable), importlib finds its
    metadata; otherwise do a cheap sdist-less build check: the pyproject
    parses and declares the expected bits."""
    try:
        import importlib.metadata as md
        dist = md.distribution("style-big-gan-tpu")
        assert dist.version
    except Exception:
        import tomllib
        with open(os.path.join(REPO, "pyproject.toml"), "rb") as f:
            data = tomllib.load(f)
        assert data["project"]["name"] == "style-big-gan-tpu"
        assert "sbg-train" in data["project"]["scripts"]
