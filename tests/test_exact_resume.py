"""Exact resume: trans.resume=from_data is a bit-identical continuation.

Version-2 snapshots carry optimizer moments, the training PRNG key, the
step counter, and pending ADA sign observations; the dataloader fast-forwards
its index stream to the interrupted position.  Training N batches, resuming,
and training N more must produce the SAME final state as 2N batches straight
— something the reference cannot do (its pickles drop optimizer state and
RNG; reference: train_parts/trainers.py:636-656).
"""

import io
import json
import os
import zipfile

import numpy as np
import pytest

from style_big_gan_tpu import registries
from style_big_gan_tpu.arguments import load_config
from style_big_gan_tpu.utils import checkpoint as ckpt

registries._import_all()

CFG_DIR = os.path.join(os.path.dirname(__file__), "..", "configs")


@pytest.fixture(scope="module")
def tiny_zip(tmp_path_factory):
    import PIL.Image
    path = tmp_path_factory.mktemp("data") / "tiny32.zip"
    rnd = np.random.RandomState(0)
    with zipfile.ZipFile(path, "w") as z:
        labels = []
        for i in range(32):
            img = (rnd.rand(32, 32, 3) * 255).astype("uint8")
            buf = io.BytesIO()
            PIL.Image.fromarray(img).save(buf, format="png")
            fname = f"img{i:05d}.png"
            z.writestr(fname, buf.getvalue())
            labels.append([fname, i % 4])
        z.writestr("dataset.json", json.dumps({"labels": labels}))
    return str(path)


def _overrides(tiny_zip, out_dir, kimg, extra=()):
    return [
        "exp.name=t", f"data.dataset_path={tiny_zip}",
        "datasets_args.image_folder.max_size=32",
        f"gen.kimg={kimg}",
        "gen.batch=8", "gen.batch_device=8", "log.kimg_per_tick=1",
        "log.metrics=[]", f"log.output={out_dir}",
        "dataloaders_args.basic.num_workers=1",
        "log.sample_grid=[4,2]",
        "perf.devices=1",
    ] + list(extra)


def _run(tiny_zip, out_dir, kimg, extra=()):
    cfg = load_config(argv=_overrides(tiny_zip, out_dir, kimg, extra),
                      yaml_path=os.path.join(CFG_DIR, "dcgan.yaml"))
    trainer = registries.trainers[str(cfg.exp.trainer)]()
    trainer.run(cfg)
    trainer.logger.close()
    return trainer.run_dir


def _final_snapshot(run_dir):
    snaps = sorted(f for f in os.listdir(run_dir)
                   if f.startswith("network-snapshot-"))
    assert snaps, f"no snapshot in {run_dir}"
    return ckpt.load_pytree_raw(os.path.join(run_dir, snaps[-1]))


def _assert_trees_identical(a, b, path=""):
    if isinstance(a, dict):
        assert isinstance(b, dict) and set(a) == set(b), \
            f"key mismatch at {path}: {set(a) ^ set(b)}"
        for k in a:
            _assert_trees_identical(a[k], b[k], f"{path}/{k}")
    else:
        av, bv = np.asarray(a), np.asarray(b)
        assert av.shape == bv.shape and av.dtype == bv.dtype, \
            f"shape/dtype mismatch at {path}"
        assert np.array_equal(av, bv), (
            f"values differ at {path}: "
            f"max |diff| = {np.max(np.abs(av.astype(np.float64) - bv.astype(np.float64)))}")


def test_exact_resume_bit_identical(tiny_zip, tmp_path):
    """N batches + resume + N batches == 2N batches straight, bit for bit:
    params, EMA, optimizer moments, PRNG key, and step counter all match."""
    # Run A: 4 batches (one k=4 dispatch cycle), snapshot at the end.
    run_a = _run(tiny_zip, tmp_path / "a", kimg=0.032)
    opts = ckpt.load_json(os.path.join(run_a, "training_options.json"))
    assert opts["start_options"]["batch_idx"] == 4

    # Run B: exact continuation of A for 4 more batches.
    run_b = _run(tiny_zip, tmp_path / "b", kimg=0.064, extra=[
        "trans.resume=from_data", f"trans.resume_dir={run_a}"])

    # Run C: 8 batches straight from scratch.
    run_c = _run(tiny_zip, tmp_path / "c", kimg=0.064)

    snap_b = _final_snapshot(run_b)
    snap_c = _final_snapshot(run_c)
    assert int(snap_b.get("snapshot_version", 1)) >= 2
    for key in ("params_g", "params_d", "params_g_ema", "opt_g", "opt_d",
                "step", "rng", "ada_p"):
        _assert_trees_identical(snap_b[key], snap_c[key], path=key)


def test_v1_snapshot_still_loads(tiny_zip, tmp_path):
    """Version-1 payloads (no optimizer state) resume with fresh moments —
    the loader must not crash on them."""
    run_a = _run(tiny_zip, tmp_path / "a", kimg=0.032)
    snaps = sorted(f for f in os.listdir(run_a)
                   if f.startswith("network-snapshot-"))
    path = os.path.join(run_a, snaps[-1])
    payload = ckpt.load_pytree_raw(path)
    for k in ("snapshot_version", "opt_g", "opt_d", "step", "rng",
              "ada_signs"):
        payload.pop(k, None)
    ckpt.save_pytree(path, payload)

    run_b = _run(tiny_zip, tmp_path / "b", kimg=0.064, extra=[
        "trans.resume=from_data", f"trans.resume_dir={run_a}"])
    snap_b = _final_snapshot(run_b)
    assert "params_g" in snap_b
