"""Named resume specs + URL resolver (dnnlib.open_url equivalent).

Rebuild of the reference's transfer-learning resume plumbing:

* named resume specs mapping short names to pretrained-network URLs
  (reference: train_parts/trainers.py:342-362),
* `open_url` — download-with-cache-and-retries
  (reference: stylegan2ada/dnnlib/util.py:397-492).

TPU-native differences: the artifact cache is keyed by the URL's md5 under
`~/.cache/style_big_gan_tpu/downloads` (same scheme as dnnlib); a cached
file is used without touching the network, so pre-seeding the cache makes
every spec work in a zero-egress environment (this image).  Reference
`.pkl` artifacts are converted on first use via tools/import_reference into
a `.msgpack` checkpoint cached next to the download.
"""

from __future__ import annotations

import hashlib
import os
import shutil
import time
import urllib.request
from typing import Optional

# Same names the reference ships (train_parts/trainers.py:342-348).
RESUME_SPECS = {
    "ffhq256": "https://nvlabs-fi-cdn.nvidia.com/stylegan2-ada-pytorch/"
               "pretrained/transfer-learning-source-nets/"
               "ffhq-res256-mirror-paper256-noaug.pkl",
    "ffhq512": "https://nvlabs-fi-cdn.nvidia.com/stylegan2-ada-pytorch/"
               "pretrained/transfer-learning-source-nets/"
               "ffhq-res512-mirror-stylegan2-noaug.pkl",
    "ffhq1024": "https://nvlabs-fi-cdn.nvidia.com/stylegan2-ada-pytorch/"
                "pretrained/transfer-learning-source-nets/"
                "ffhq-res1024-mirror-stylegan2-noaug.pkl",
    "celebahq256": "https://nvlabs-fi-cdn.nvidia.com/stylegan2-ada-pytorch/"
                   "pretrained/transfer-learning-source-nets/"
                   "celebahq-res256-mirror-paper256-kimg100000-ada-"
                   "target0.5.pkl",
    "lsundog256": "https://nvlabs-fi-cdn.nvidia.com/stylegan2-ada-pytorch/"
                  "pretrained/transfer-learning-source-nets/"
                  "lsundog-res256-paper256-kimg100000-noaug.pkl",
}


def default_cache_dir() -> str:
    return os.path.join(os.path.expanduser("~"), ".cache",
                        "style_big_gan_tpu", "downloads")


def is_url(s: str) -> bool:
    return s.startswith(("http://", "https://", "file://"))


def open_url(url: str, cache_dir: Optional[str] = None,
             num_attempts: int = 3, verbose: bool = True) -> str:
    """Resolve a URL to a local file path, downloading through an
    md5-of-url-keyed cache with retries (reference: dnnlib/util.py:397-492;
    returns a path instead of a file object — callers here all want paths).

    A cache hit never touches the network, so a pre-seeded cache works with
    zero egress.  `file://` paths are used in place."""
    if url.startswith("file://"):
        path = url[len("file://"):]
        if not os.path.isfile(path):
            raise FileNotFoundError(path)
        return path
    if not is_url(url):
        if os.path.isfile(url):
            return url
        raise FileNotFoundError(url)

    cache_dir = cache_dir or default_cache_dir()
    os.makedirs(cache_dir, exist_ok=True)
    url_md5 = hashlib.md5(url.encode("utf-8")).hexdigest()
    fname = os.path.basename(url.split("?")[0]) or "download"
    cache_file = os.path.join(cache_dir, f"{url_md5}-{fname}")
    if os.path.isfile(cache_file):
        return cache_file

    last_err: Optional[Exception] = None
    for attempt in range(num_attempts):
        try:
            if verbose:
                print(f"Downloading {url} (attempt "
                      f"{attempt + 1}/{num_attempts}) ...")
            tmp = cache_file + f".tmp.{os.getpid()}"
            with urllib.request.urlopen(url, timeout=60) as r, \
                    open(tmp, "wb") as f:
                shutil.copyfileobj(r, f)
            os.replace(tmp, cache_file)   # atomic publish
            return cache_file
        except Exception as e:               # noqa: BLE001 — retry any I/O
            last_err = e
            if attempt + 1 < num_attempts:
                time.sleep(2.0 * (attempt + 1))
    raise RuntimeError(
        f"could not download {url}: {last_err!r}. In a no-egress "
        f"environment, pre-seed the cache: place the file at {cache_file}")


def resolve_resume_spec(spec: str, cache_dir: Optional[str] = None,
                        convert_pickles: bool = True) -> Optional[str]:
    """'noresume' -> None; a named spec or URL -> cached local file; a local
    path -> itself.  Reference `.pkl` network files are converted to a
    native checkpoint (cached as <file>.msgpack) via tools/import_reference,
    so `trans.resume=ffhq256` yields something setup_networks can load
    (reference: trainers.py:352-362 + legacy.py pickle loading)."""
    if not spec or spec == "noresume":
        return None
    url = RESUME_SPECS.get(spec, spec)
    path = open_url(url, cache_dir=cache_dir)
    if convert_pickles and path.endswith((".pkl", ".pt", ".pth")):
        converted = path + ".msgpack"
        if not os.path.isfile(converted):
            from style_big_gan_tpu.tools.import_reference import (
                import_pickle_to_checkpoint)
            import_pickle_to_checkpoint(path, converted)
        return converted
    return path
