#!/usr/bin/env python
"""Thin shim: the reference-identical ``python starter.py ...`` invocation
(reference: starter.py:12-45).  The real entry point lives in
style_big_gan_tpu/starter.py and is also installed as ``sbg-train``."""

from style_big_gan_tpu.starter import main

if __name__ == "__main__":
    main()
