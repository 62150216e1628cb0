#!/usr/bin/env python
"""Package flexneuart_spark into dist/flexneuart_spark.zip for
``spark-submit --py-files``."""

from __future__ import annotations

import os
import zipfile

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    os.makedirs(f"{ROOT}/dist", exist_ok=True)
    out = f"{ROOT}/dist/flexneuart_spark.zip"
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for dirpath, _dirnames, filenames in os.walk(f"{ROOT}/flexneuart_spark"):
            if "__pycache__" in dirpath:
                continue
            for fn in filenames:
                # .txt = package data (lemma dictionary, WordPiece vocab)
                if fn.endswith((".py", ".txt")):
                    full = os.path.join(dirpath, fn)
                    z.write(full, os.path.relpath(full, ROOT))
    print(out)


if __name__ == "__main__":
    main()
