"""Package the engine as a --py-files zip for spark-submit deployment.

    python scripts/package_pyfiles.py   # -> dist/engine.zip

Only the package's .py sources go into the archive (no tests, no data) —
the ship-resources-not-fetch deployment rule of the reference's offline
schema resolution (Jhove.kt:159-216) applied to code distribution.
"""

from __future__ import annotations

import os
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = "nifi_tekst_bundle_spark"


def build(out_path: str | None = None) -> str:
    out_path = out_path or os.path.join(REPO, "dist", "engine.zip")
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as z:
        for root, _dirs, files in os.walk(os.path.join(REPO, PKG)):
            for fn in sorted(files):
                if not fn.endswith(".py"):
                    continue
                full = os.path.join(root, fn)
                rel = os.path.relpath(full, REPO)
                z.write(full, rel)
    return out_path


if __name__ == "__main__":
    print(build())
