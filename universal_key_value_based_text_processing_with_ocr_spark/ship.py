"""Ship this package to executor python workers of a live SparkSession.

Local workers do not inherit the driver's sys.path; a one-time zip +
``addPyFile`` is the --py-files mechanism attachable after session start.
"""

from __future__ import annotations

import tempfile
import zipfile
from pathlib import Path

_PKG_DIR = Path(__file__).resolve().parent


def ship_package(spark) -> None:
    """Idempotently make this package importable in executor workers."""
    zip_path = Path(tempfile.gettempdir()) / f"{_PKG_DIR.name}.zip"
    if not zip_path.exists():
        with zipfile.ZipFile(zip_path, "w") as zf:
            for f in sorted(_PKG_DIR.rglob("*")):
                if f.is_file() and "__pycache__" not in f.parts:
                    zf.write(f, f.relative_to(_PKG_DIR.parent))
    try:
        spark.sparkContext.addPyFile(str(zip_path))
    except Exception:
        pass  # already registered with this context
