"""Ship this package to executor python workers of a live SparkSession.

Local workers do not inherit the driver's sys.path; a one-time zip +
``addPyFile`` is the --py-files mechanism attachable after session start.

The zip is named by a content hash of the package sources so that (a) a
source edit always produces a fresh zip — executors can never keep running
stale code — and (b) concurrent users/processes on a shared host never
collide on one world-writable path (the zip also lives in a per-user dir).
"""

from __future__ import annotations

import getpass
import hashlib
import os
import tempfile
import zipfile
from pathlib import Path

_PKG_DIR = Path(__file__).resolve().parent

# (applicationId, digest) pairs already registered in this process, so a
# second ship_package on the same live context is a no-op instead of a
# duplicate addPyFile.  applicationId is stable per context and never reused
# the way id() addresses are after a stop()+GC.
_SHIPPED: set[tuple[str, str]] = set()


def _package_files() -> list[Path]:
    return [
        f
        for f in sorted(_PKG_DIR.rglob("*"))
        if f.is_file() and "__pycache__" not in f.parts and f.suffix != ".pyc"
    ]


def _package_digest(files: list[Path]) -> str:
    h = hashlib.sha256()
    for f in files:
        h.update(str(f.relative_to(_PKG_DIR)).encode())
        h.update(b"\0")
        h.update(f.read_bytes())
    return h.hexdigest()[:16]


def ship_package(spark) -> None:
    """Idempotently make this package importable in executor workers."""
    files = _package_files()
    digest = _package_digest(files)
    key = (spark.sparkContext.applicationId, digest)
    if key in _SHIPPED:
        return

    ship_dir = Path(tempfile.gettempdir()) / f"ukv-ship-{getpass.getuser()}"
    ship_dir.mkdir(mode=0o700, exist_ok=True)
    # The parent tempdir is world-writable: another local user could have
    # pre-created this path and could then plant a digest-named zip that
    # addPyFile would ship to executors (arbitrary code).  Accept the
    # directory only if we own it and nobody else can write it; otherwise
    # fall back to a fresh private directory.
    st = ship_dir.stat()
    if st.st_uid != os.getuid() or (st.st_mode & 0o022):
        ship_dir = Path(tempfile.mkdtemp(prefix="ukv-ship-"))
    zip_path = ship_dir / f"{_PKG_DIR.name}-{digest}.zip"
    if not zip_path.exists():
        tmp = zip_path.with_name(f"{zip_path.name}.tmp-{os.getpid()}")
        with zipfile.ZipFile(tmp, "w") as zf:
            for f in files:
                zf.write(f, f.relative_to(_PKG_DIR.parent))
        os.replace(tmp, zip_path)  # atomic: racing processes converge on one file
    spark.sparkContext.addPyFile(str(zip_path))
    _SHIPPED.add(key)
