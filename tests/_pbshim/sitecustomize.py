"""Test-env shim: make ``google.protobuf`` importable when no protobuf wheel
is installed, by borrowing the pure-Python runtime that ships inside the
locally installed Google Cloud SDK (app-engine platform dir).

transformWithStateInPandas needs protobuf in BOTH the driver and the Python
workers (`pyspark.sql.streaming.proto.StateMessage_pb2` is imported by the
stateful-processor API client on each side).  ``tests/conftest.py`` imports
this module in the driver and prepends this directory to ``PYTHONPATH`` so
forked workers pick it up via the standard ``sitecustomize`` hook.

Two pieces:

1. Path fallback — if ``google.protobuf`` is not importable, append the
   cloud-sdk app-engine platform dir (protobuf 6.32 pure-Python runtime).
2. Lenient gencode check — PySpark 4.1's generated ``StateMessage_pb2`` was
   built with protoc 6.33; the 6.32 runtime refuses to load newer-minor
   gencode.  Within the same MAJOR the wire format and descriptor layout are
   stable, so downgrade that refusal to a warning.  A real major-version
   mismatch still raises.

No effect at all when a proper protobuf wheel is installed (the import
succeeds and the fallback never triggers; the lenient wrapper defers to the
original validator first and only swallows same-major errors).
"""

from __future__ import annotations

import os
import sys
import warnings

_APPENGINE = "/usr/lib/google-cloud-sdk/platform/google_appengine"


def install() -> bool:
    """Idempotently install the shim; return True if protobuf is usable."""
    try:
        # `import google.protobuf` alone is not a sufficient probe: an empty
        # namespace-package portion (a bare `google/` dir somewhere on the
        # worker's sys.path) makes it "succeed" with no modules inside.
        # Probe a real submodule.
        from google.protobuf import descriptor  # noqa: F401
    except ImportError:
        if not os.path.isdir(os.path.join(_APPENGINE, "google", "protobuf")):
            return False
        if _APPENGINE not in sys.path:
            # append (not insert): never shadow real site-packages modules
            sys.path.append(_APPENGINE)
        # Drop any half-imported namespace stubs so the re-import rescans
        # sys.path; a regular package (appengine's google/protobuf with
        # __init__.py) wins over namespace portions wherever it sits.
        import importlib

        for name in [
            m for m in list(sys.modules) if m == "google" or m.startswith("google.")
        ]:
            del sys.modules[name]
        importlib.invalidate_caches()
        try:
            from google.protobuf import descriptor  # noqa: F401
        except ImportError:
            return False

    from google.protobuf import runtime_version as _rv

    if getattr(_rv.ValidateProtobufRuntimeVersion, "_pbshim", False):
        return True
    _orig = _rv.ValidateProtobufRuntimeVersion

    def _lenient(gen_domain, gen_major, gen_minor, gen_patch, gen_suffix, location):
        try:
            _orig(gen_domain, gen_major, gen_minor, gen_patch, gen_suffix, location)
        except _rv.VersionError:
            if gen_major != _rv.MAJOR:
                raise
            warnings.warn(
                f"pbshim: loading gencode {gen_major}.{gen_minor}.{gen_patch} "
                f"({location}) on older same-major runtime "
                f"{_rv.MAJOR}.{_rv.MINOR}.{_rv.PATCH}"
            )

    _lenient._pbshim = True
    _rv.ValidateProtobufRuntimeVersion = _lenient
    return True


# `sitecustomize` execution path (Python worker startup): install silently.
if os.path.basename(__file__) == "sitecustomize.py":
    try:
        ok = install()
        if os.environ.get("PBSHIM_DEBUG"):
            with open("/tmp/pbshim_debug.log", "a") as f:
                f.write(f"pid={os.getpid()} ok={ok} path={sys.path}\n")
    except Exception as e:
        if os.environ.get("PBSHIM_DEBUG"):
            with open("/tmp/pbshim_debug.log", "a") as f:
                f.write(f"pid={os.getpid()} err={e!r}\n")
