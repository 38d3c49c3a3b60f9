"""Named resume specs + open_url resolver (reference: dnnlib/util.py:397-492,
train_parts/trainers.py:342-362)."""

import os

import pytest

from style_big_gan_tpu.utils import resolver


def test_resume_spec_names_match_reference():
    assert set(resolver.RESUME_SPECS) == {
        "ffhq256", "ffhq512", "ffhq1024", "celebahq256", "lsundog256"}
    assert all(u.startswith("https://") for u in
               resolver.RESUME_SPECS.values())


def test_open_url_local_path_passthrough(tmp_path):
    p = tmp_path / "net.msgpack"
    p.write_bytes(b"x")
    assert resolver.open_url(str(p)) == str(p)


def test_open_url_file_scheme(tmp_path):
    p = tmp_path / "net.msgpack"
    p.write_bytes(b"x")
    assert resolver.open_url("file://" + str(p)) == str(p)
    with pytest.raises(FileNotFoundError):
        resolver.open_url("file://" + str(tmp_path / "missing"))


def test_open_url_cache_hit_never_touches_network(tmp_path):
    """A pre-seeded cache file resolves with zero egress — the offline
    workflow for this image."""
    url = resolver.RESUME_SPECS["ffhq256"]
    import hashlib
    md5 = hashlib.md5(url.encode()).hexdigest()
    fname = os.path.basename(url)
    cached = tmp_path / f"{md5}-{fname}"
    cached.write_bytes(b"pretend-pickle")
    got = resolver.open_url(url, cache_dir=str(tmp_path))
    assert got == str(cached)


def test_open_url_failure_names_cache_path(tmp_path):
    """Unreachable URL -> error telling the user where to pre-seed."""
    with pytest.raises(RuntimeError, match="pre-seed the cache"):
        resolver.open_url("http://127.0.0.1:9/nothing.pkl",
                          cache_dir=str(tmp_path), num_attempts=1)


def test_resolve_noresume_is_none():
    assert resolver.resolve_resume_spec("noresume") is None
    assert resolver.resolve_resume_spec("") is None


def test_resolve_local_msgpack_as_is(tmp_path):
    p = tmp_path / "snap.msgpack"
    p.write_bytes(b"x")
    assert resolver.resolve_resume_spec(str(p)) == str(p)


def test_resolve_pkl_converts_through_importer(tmp_path, monkeypatch):
    """A .pkl resolves to a cached converted .msgpack via
    tools.import_reference (conversion itself is covered by
    test_reference_parity.py importer tests)."""
    calls = []

    def fake_convert(src, out, key="G_ema"):
        calls.append((src, out))
        with open(out, "wb") as f:
            f.write(b"converted")
        return out

    from style_big_gan_tpu.tools import import_reference
    monkeypatch.setattr(import_reference, "import_pickle_to_checkpoint",
                        fake_convert)
    p = tmp_path / "net.pkl"
    p.write_bytes(b"pickle")
    got = resolver.resolve_resume_spec(str(p))
    assert got == str(p) + ".msgpack" and len(calls) == 1
    # Second resolve: cached, no re-conversion.
    assert resolver.resolve_resume_spec(str(p)) == got and len(calls) == 1
