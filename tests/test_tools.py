"""Inference/tooling CLI tests: train a tiny run once, then drive generate,
style_mixing, calc_metrics, projector and dataset_tool against it."""

import io
import json
import os
import zipfile

import numpy as np
import pytest

from style_big_gan_tpu import registries
from style_big_gan_tpu.arguments import load_config

registries._import_all()

CFG_DIR = os.path.join(os.path.dirname(__file__), "..", "configs")


@pytest.fixture(scope="module")
def tiny_zip(tmp_path_factory):
    import PIL.Image
    path = tmp_path_factory.mktemp("data") / "tiny32.zip"
    rnd = np.random.RandomState(0)
    with zipfile.ZipFile(path, "w") as z:
        labels = []
        for i in range(16):
            img = (rnd.rand(32, 32, 3) * 255).astype("uint8")
            buf = io.BytesIO()
            PIL.Image.fromarray(img).save(buf, format="png")
            fname = f"img{i:05d}.png"
            z.writestr(fname, buf.getvalue())
            labels.append([fname, i % 2])
        z.writestr("dataset.json", json.dumps({"labels": labels}))
    return str(path)


@pytest.fixture(scope="module")
def tiny_run(tiny_zip, tmp_path_factory):
    """One tiny SG2 training run (module-scoped) used by all tool tests."""
    out = tmp_path_factory.mktemp("run")
    cfg = load_config(argv=[
        "exp.name=toolrun", f"data.dataset_path={tiny_zip}",
        "datasets_args.image_folder.max_size=16", "gen.kimg=1",
        "gen.batch=8", "gen.batch_device=8", "log.kimg_per_tick=1",
        "log.metrics=[]", f"log.output={out}", "log.sample_grid=[2,2]",
        "dataloaders_args.basic.num_workers=1", "aug.aug=noaug",
        "gen.disc_regs=[]",
        "gens_args.sg2_classic.z_dim=16", "gens_args.sg2_classic.w_dim=16",
        "gens_args.sg2_classic.channel_base=256",
        "gens_args.sg2_classic.channel_max=32",
        "discs_args.sg2_classic.channel_base=256",
        "discs_args.sg2_classic.channel_max=32",
        "discs_args.sg2_classic.epilogue_kwargs.mbstd_group_size=2",
    ], yaml_path=os.path.join(CFG_DIR, "sg2ada.yaml"))
    trainer = registries.trainers["sg2"]()
    trainer.run(cfg)
    run_dir = trainer.run_dir
    trainer.logger.close()
    return run_dir


def test_loader_roundtrip(tiny_run):
    from style_big_gan_tpu.tools.loader import load_generator
    G, g_vars, opts = load_generator(tiny_run)
    assert "params" in g_vars
    assert int(G.img_resolution) == 32


def test_generate_cli(tiny_run, tmp_path):
    from style_big_gan_tpu.tools import generate
    out = tmp_path / "gen"
    generate.main(["--run-dir", tiny_run, "--seeds", "0-2",
                   "--outdir", str(out), "--trunc", "0.8"])
    files = sorted(os.listdir(out))
    assert files == ["seed0000.png", "seed0001.png", "seed0002.png"]


def test_parse_range():
    from style_big_gan_tpu.tools.generate import parse_range
    assert parse_range("1,2,5-7") == [1, 2, 5, 6, 7]


def test_style_mixing_cli(tiny_run, tmp_path):
    from style_big_gan_tpu.tools import style_mixing
    out = tmp_path / "mix"
    style_mixing.main(["--run-dir", tiny_run, "--rows", "1,2",
                       "--cols", "3,4", "--styles", "0-3",
                       "--outdir", str(out)])
    assert (out / "grid.png").exists()
    assert (out / "1-3.png").exists()


def test_calc_metrics_cli(tiny_run, tiny_zip):
    from style_big_gan_tpu.tools import calc_metrics
    res = calc_metrics.calc_metrics(tiny_run, ["fid50k"], tiny_zip,
                                    detector="fake_v1", batch=8)
    # num_items limited by dataset size through the budget override;
    # stand-in detector results carry the loud @fake_v1 suffix
    assert "fid50k@fake_v1" in res or res == {}
    jsonl = os.path.join(tiny_run, "metric-fid50k.jsonl")
    assert os.path.isfile(jsonl)


def test_projector_runs(tiny_run, tmp_path):
    import PIL.Image
    from style_big_gan_tpu.tools import projector
    target = tmp_path / "target.png"
    PIL.Image.fromarray(
        (np.random.RandomState(0).rand(32, 32, 3) * 255).astype("uint8")
    ).save(target)
    out = tmp_path / "proj"
    projector.run_projection(tiny_run, str(target), str(out), num_steps=5,
                             seed=1, save_video=True)
    assert (out / "proj.png").exists()
    assert (out / "projected_w.npz").exists()
    # mp4 with ffmpeg available, GIF fallback otherwise
    assert (out / "proj.mp4").exists() or (out / "proj.gif").exists()


def test_projected_w_roundtrip(tiny_run, tmp_path):
    """Project a synthetic target, then re-render its saved W via
    generate --projected-w (reference: projector.py:190-199 +
    generate.py:73-84)."""
    import PIL.Image
    from style_big_gan_tpu.tools import generate, projector
    target = tmp_path / "target.png"
    PIL.Image.fromarray(
        (np.random.RandomState(1).rand(32, 32, 3) * 255).astype("uint8")
    ).save(target)
    proj_out = tmp_path / "proj"
    projector.run_projection(tiny_run, str(target), str(proj_out),
                             num_steps=3, seed=2)
    gen_out = tmp_path / "gen"
    generate.main(["--run-dir", tiny_run,
                   "--projected-w", str(proj_out / "projected_w.npz"),
                   "--outdir", str(gen_out)])
    assert (gen_out / "proj00.png").exists()
    # The re-render must match the projector's own final render.
    a = np.asarray(PIL.Image.open(gen_out / "proj00.png"))
    b = np.asarray(PIL.Image.open(proj_out / "proj.png"))
    np.testing.assert_allclose(a.astype(np.int32), b.astype(np.int32),
                               atol=1)


def test_dataset_tool_folder_to_zip(tmp_path):
    import PIL.Image
    from style_big_gan_tpu.tools import dataset_tool
    src = tmp_path / "src"
    src.mkdir()
    for i in range(4):
        PIL.Image.fromarray(
            (np.random.rand(16, 16, 3) * 255).astype("uint8")).save(
            src / f"{i}.png")
    dest = tmp_path / "out.zip"
    dataset_tool.convert_dataset(str(src), str(dest))
    from style_big_gan_tpu.data.dataset import ImageFolderDataset
    ds = ImageFolderDataset(path=str(dest))
    assert len(ds) == 4 and ds.resolution == 16


def test_dataset_tool_resolution_check(tmp_path):
    import PIL.Image
    from style_big_gan_tpu.tools import dataset_tool
    src = tmp_path / "src"
    src.mkdir()
    PIL.Image.fromarray(
        (np.random.rand(20, 20, 3) * 255).astype("uint8")).save(
        src / "a.png")
    with pytest.raises(SystemExit):
        dataset_tool.convert_dataset(str(src), str(tmp_path / "o.zip"))


def test_find_snapshot_resolution(tmp_path):
    """Bare names resolve inside run_dir; a missing explicit snapshot is an
    error (silent fallback to the latest snapshot misattributes metrics)."""
    import pytest as _pytest

    from style_big_gan_tpu.tools.loader import find_snapshot
    d = tmp_path / "run"
    d.mkdir()
    for kimg in ("000008", "000300"):
        (d / f"network-snapshot-{kimg}.msgpack").write_bytes(b"x")
    assert find_snapshot(str(d)).endswith("000300.msgpack")
    got = find_snapshot(str(d), "network-snapshot-000008.msgpack")
    assert got.endswith("000008.msgpack")
    assert find_snapshot(str(d), str(d / "network-snapshot-000008.msgpack"))\
        .endswith("000008.msgpack")
    with _pytest.raises(FileNotFoundError):
        find_snapshot(str(d), "network-snapshot-999999.msgpack")
