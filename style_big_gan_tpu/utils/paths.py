"""Path resolution for shipped resources (configs/, native/).

The reference resolves configs relative to the CWD only
(reference: arguments.py:146-158); after ``pip install -e .`` this package
must find its shipped recipe directory from any CWD, so tools and the
trainer resolve defaults through here.
"""

from __future__ import annotations

import os

_PKG_DIR = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def repo_root() -> str:
    """Directory containing the package (the repo root for an editable
    install or a source checkout)."""
    return os.path.dirname(_PKG_DIR)


def default_config_dir() -> str:
    """The shipped configs/ directory (repo-root configs/ when present)."""
    return os.path.join(repo_root(), "configs")


def native_dir() -> str:
    """The native/ directory holding the C++ data-loader sources +
    Makefile (built with ``make -C native``)."""
    return os.path.join(repo_root(), "native")
