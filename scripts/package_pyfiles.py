#!/usr/bin/env python
"""Build dist/simplecrawler_spark.zip for spark-submit --py-files.

The zip contains the pure-Python ``simplecrawler_spark`` package only —
executors import it from the zip; no pip install on the cluster
(north rule, BASELINE.json:14).
"""

from __future__ import annotations

import os
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = os.path.join(REPO, "simplecrawler_spark")
OUT = os.path.join(REPO, "dist", "simplecrawler_spark.zip")


def build(out: str = OUT) -> str:
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as zf:
        for dirpath, _dirnames, filenames in os.walk(PKG):
            if "__pycache__" in dirpath:
                continue
            for fn in sorted(filenames):
                if not fn.endswith(".py"):
                    continue
                full = os.path.join(dirpath, fn)
                arc = os.path.relpath(full, REPO)
                zf.write(full, arc)
    return out


if __name__ == "__main__":
    print(build())
