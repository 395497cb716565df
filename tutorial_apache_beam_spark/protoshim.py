"""Activation hook for the vendored pure-Python protobuf runtime.

PySpark's state-v2 API (`transformWithStateInPandas`) speaks protobuf
between the Python worker and the JVM state server; its generated
`StateMessage_pb2` module needs a `google.protobuf` runtime. Containers
without the protobuf wheel (like this sandbox) can use the minimal shim
under `vendor/protoshim/` instead — see that package's `_shim.py` for
scope and limitations. A real protobuf installation always wins — in the
driver because this hook imports it first, and in worker processes
(where the PYTHONPATH prepend would otherwise shadow site-packages)
because the vendored `google/protobuf/__init__.py` scans the rest of
sys.path and re-executes itself from a real installation when one
exists.

Call `ensure_protobuf_runtime()` BEFORE creating the first SparkSession:
Spark's Python workers inherit `PYTHONPATH` from the JVM process
environment, which is captured at JVM launch. For a session that is
already running, pass it in — the shim is then also shipped to workers
via `addPyFile`, which reaches them regardless of the JVM's environment.
"""

from __future__ import annotations

import os
import sys
import tempfile
import zipfile

VENDOR_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "vendor",
    "protoshim",
)


def ensure_protobuf_runtime(spark=None) -> str:
    """Make `google.protobuf` importable here and in Spark Python workers.

    Returns "native" if the real runtime is installed, "shim" if the
    vendored runtime was activated. Raises ImportError if neither works.
    """
    try:
        import google.protobuf  # noqa: F401

        return "native"
    except ImportError:
        pass

    if VENDOR_DIR not in sys.path:
        sys.path.insert(0, VENDOR_DIR)
    existing = os.environ.get("PYTHONPATH", "")
    parts = [p for p in existing.split(os.pathsep) if p]
    if VENDOR_DIR not in parts:
        os.environ["PYTHONPATH"] = os.pathsep.join([VENDOR_DIR] + parts)
    # A failed earlier import may have cached a bare namespace package.
    sys.modules.pop("google", None)
    import google.protobuf  # noqa: F401

    if spark is not None:
        spark.sparkContext.addPyFile(_shim_zip())
    return "shim"


_ZIP_CACHE: str | None = None


def _shim_zip() -> str:
    """Zip the shim package once per process (zipimport-compatible), for
    shipping to already-running sessions via addPyFile."""
    global _ZIP_CACHE
    if _ZIP_CACHE is not None and os.path.exists(_ZIP_CACHE):
        return _ZIP_CACHE
    path = os.path.join(tempfile.mkdtemp(prefix="protoshim_"), "protoshim.zip")
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, _dirs, files in os.walk(VENDOR_DIR):
            for name in files:
                if not name.endswith(".py"):
                    continue
                full = os.path.join(root, name)
                zf.write(full, os.path.relpath(full, VENDOR_DIR))
    _ZIP_CACHE = path
    return path
