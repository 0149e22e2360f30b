"""Build the ``--py-files`` archive for cluster submission.

The north rule's deployment shape is ``spark-submit --py-files
kafka_connect_plugins_spark.zip kafka_connect_plugins_spark/main.py ...``:
the primary script runs as ``__main__`` on the driver while the zip
supplies the package to BOTH the driver's ``sys.path`` and every executor's
Python workers (pandas UDFs / ``mapInPandas`` bodies import from it there —
a driver-side ``sys.path`` tweak never reaches workers).

Usage::

    python tools/make_pyfiles_zip.py [out.zip]

Deterministic: fixed timestamps and sorted member order, so repeated builds
are byte-identical and executor-side caches never see a spurious change.
"""

from __future__ import annotations

import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PACKAGE = "kafka_connect_plugins_spark"

# zipfile uses the DOS epoch; any fixed post-1980 stamp keeps builds identical
_FIXED_DATE = (1980, 1, 1, 0, 0, 0)


def build_zip(out_path: str) -> str:
    """Zip the package (pure .py sources only) into *out_path*; returns it."""
    pkg_root = os.path.join(REPO, PACKAGE)
    members: list[tuple[str, str]] = []
    for dirpath, dirnames, filenames in os.walk(pkg_root):
        dirnames[:] = sorted(d for d in dirnames if d != "__pycache__")
        for name in sorted(filenames):
            if not name.endswith(".py"):
                continue
            full = os.path.join(dirpath, name)
            arcname = os.path.relpath(full, REPO)
            members.append((full, arcname))
    if not members:
        raise FileNotFoundError(f"no package sources under {pkg_root}")
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for full, arcname in members:
            info = zipfile.ZipInfo(arcname, date_time=_FIXED_DATE)
            info.compress_type = zipfile.ZIP_DEFLATED
            info.external_attr = 0o644 << 16
            with open(full, "rb") as fh:
                zf.writestr(info, fh.read())
    return out_path


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else f"{PACKAGE}.zip"
    print(build_zip(out))
