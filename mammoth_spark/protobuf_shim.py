"""Make ``google.protobuf`` importable in containers that lack the PyPI
package, so Spark 4's transformWithState Python protocol can run.

The gcloud SDK ships a pure-Python protobuf runtime vendored at
``/usr/lib/google-cloud-sdk/lib/third_party/cloudsdk/google/protobuf``
with its absolute imports rewritten to ``cloudsdk.google.protobuf``.
``ensure_protobuf()`` materializes a standard-layout copy (imports
rewritten back) into a gitignored cache directory, adds it to both
``sys.path`` and ``PYTHONPATH`` (Python workers spawned by the JVM
inherit the env), and fills the one API gap: protoc-6.x generated code
calls ``google.protobuf.runtime_version.ValidateProtobufRuntimeVersion``,
which the 4.23 runtime predates — the shim installs a no-op module. The
descriptor wire format itself is stable proto2/proto3, so a 6.x-serialized
FileDescriptorProto loads fine on the 4.23 pure-Python runtime.

This is environment plumbing, not engine code: nothing in the query
surface depends on it. Only the transformWithState execution test
(tests/test_tws.py) calls ``ensure_protobuf()``.
"""

from __future__ import annotations

import os
import sys

GCLOUD_PB = "/usr/lib/google-cloud-sdk/lib/third_party/cloudsdk/google/protobuf"

_RUNTIME_VERSION_STUB = '''\
"""Stub for protobuf >= 5.27's runtime_version module (absent in 4.23).

Generated code validates gencode-vs-runtime version compatibility here;
this shim accepts anything — the descriptor wire format the generated
code actually relies on is stable across these versions.
"""

from enum import Enum


class Domain(Enum):
    GOOGLE_INTERNAL = 1
    PUBLIC = 2


class VersionError(Exception):
    pass


def ValidateProtobufRuntimeVersion(*args, **kwargs):  # noqa: N802
    return None
'''


def ensure_protobuf(cache_dir: str | None = None) -> bool:
    """Return True if ``google.protobuf`` is importable, building the
    rewritten copy on first use. False when neither a real install nor
    the gcloud vendored runtime exists (callers should skip, not fail)."""
    try:
        import google.protobuf  # noqa: F401

        return True
    except ImportError:
        pass
    if not os.path.isdir(GCLOUD_PB):
        return False

    root = cache_dir or os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".pb_shim"
    )
    dest = os.path.join(root, "google", "protobuf")
    marker = os.path.join(root, ".complete")
    if not os.path.exists(marker):
        _materialize(GCLOUD_PB, dest)
        with open(os.path.join(root, "google", "__init__.py"), "w") as fh:
            fh.write("__path__ = __import__('pkgutil').extend_path(__path__, __name__)\n")
        rv = os.path.join(dest, "runtime_version.py")
        if not os.path.exists(rv):
            with open(rv, "w") as fh:
                fh.write(_RUNTIME_VERSION_STUB)
        with open(marker, "w") as fh:
            fh.write("ok\n")

    if root not in sys.path:
        sys.path.insert(0, root)
    # Spark's Python workers are separate processes; they see PYTHONPATH,
    # not the driver's sys.path mutations. Export the repo root too:
    # transformWithState's state-server workers unpickle StatefulProcessor
    # subclasses BY REFERENCE (module+qualname) and — unlike pandas-UDF
    # workers — do not honor session addPyFile, so ``mammoth_spark`` must
    # be importable from the environment the JVM was launched with.
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    existing = os.environ.get("PYTHONPATH", "")
    parts = existing.split(os.pathsep) if existing else []
    for p in (root, repo_root):
        if p not in parts:
            parts.insert(0, p)
    os.environ["PYTHONPATH"] = os.pathsep.join(parts)
    try:
        import google.protobuf  # noqa: F401

        return True
    except ImportError:
        return False


def _materialize(src: str, dest: str) -> None:
    for dirpath, dirnames, filenames in os.walk(src):
        dirnames[:] = [d for d in dirnames if d != "__pycache__"]
        rel = os.path.relpath(dirpath, src)
        out_dir = dest if rel == "." else os.path.join(dest, rel)
        os.makedirs(out_dir, exist_ok=True)
        for name in filenames:
            if not name.endswith(".py"):
                continue
            with open(os.path.join(dirpath, name), "rb") as fh:
                body = fh.read()
            body = body.replace(b"cloudsdk.google.protobuf", b"google.protobuf")
            with open(os.path.join(out_dir, name), "wb") as fh:
                fh.write(body)
