"""Dry test of tools/verify_detectors.py with the scripted oracles.

The real NVlabs detector weights cannot exist in this zero-egress image
(BASELINE.md), so the one-command verification tool is exercised end-to-end
on the in-repo torch oracles scripted into real TorchScript files — the same
code path real weights take (torch.jit.load -> convert -> calc_metrics both
ways -> pass/fail report).

Reference being matched: stylegan2ada/metrics/metric_utils.py:41-52
(TorchScript detector acquisition) + BASELINE.json's 5% north star.
"""

import json
import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, os.path.dirname(__file__))

from style_big_gan_tpu import registries

registries._import_all()


def test_verify_detectors_dry_run(parity_run, parity_zip, inception_pair,
                                  vgg_pair, tmp_path):
    from style_big_gan_tpu.tools.verify_detectors import verify

    inception_pt, _ = inception_pair
    vgg_pt, _ = vgg_pair
    report, ok = verify(
        inception=inception_pt, vgg16=vgg_pt, run_dir=parity_run,
        data=parity_zip, num_items=16, batch=8,
        workdir=str(tmp_path / "wk"))
    assert ok, report
    names = [c["name"] for c in report["checks"]]
    # FID north-star comparison + feature parity + KID/IS + PPL all ran.
    assert any("FID" in n for n in names)
    assert any("PPL" in n for n in names)
    assert all(c["pass"] for c in report["checks"]), report
    # The report file is written for the record.
    out = json.load(open(str(tmp_path / "wk" / "verify_detectors.json")))
    assert out["ok"] is True


def test_verify_detectors_detects_wrong_weights(parity_run, parity_zip,
                                                inception_pair, tmp_path):
    """A detector whose converted weights DIFFER must FAIL the report —
    the tool must not rubber-stamp."""
    from torch_detector_oracles import (TorchInceptionV3FIDTS,
                                        randomize_inception_)

    from style_big_gan_tpu.tools.verify_detectors import verify

    inception_pt, _ = inception_pair
    # Script a DIFFERENT-seed oracle and pass it as the "real" torch file
    # while the npz conversion happens from it too — but corrupt the wrapper
    # comparison by evaluating against a different-seed TorchScript file.
    other = randomize_inception_(TorchInceptionV3FIDTS(), seed=1)
    other_pt = str(tmp_path / "other.pt")
    torch.jit.script(other).save(other_pt)

    # Convert npz from seed-0 weights but run the torch path with seed-1:
    # numbers must disagree -> ok False.
    import style_big_gan_tpu.tools.verify_detectors as vd

    orig = vd._feature_parity_inception

    def cross(pt_path, npz_path, batch=4):
        return orig(other_pt, npz_path, batch)

    vd._feature_parity_inception = cross
    try:
        report, ok = verify(
            inception=inception_pt, vgg16=None, run_dir=parity_run,
            data=parity_zip, num_items=16, batch=8,
            workdir=str(tmp_path / "wk2"))
    finally:
        vd._feature_parity_inception = orig
    assert not all(c["pass"] for c in report["checks"])
    assert not ok
