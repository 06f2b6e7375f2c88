"""Locate a usable ``google.protobuf`` runtime for the TWS state server.

Spark 4's ``transformWithStateInPandas`` python worker exchanges state
with the JVM state server over protobuf (generated code in
``pyspark.sql.streaming.proto.StateMessage_pb2``). The protobuf *runtime*
(the public, BSD-licensed ``google.protobuf`` package) is not a pyspark
install dependency, so environments without it can plan but not execute
TWS queries.

This module makes execution possible without a package install by
probing for an already-present copy of the public protobuf runtime:

1. ``import google.protobuf`` directly (a normally-installed runtime);
2. a root named in ``$SPARK_GRAFT_PROTOBUF_ROOT`` (a directory that
   contains ``google/protobuf/__init__.py`` — e.g. an unpacked
   ``protobuf`` wheel);
3. well-known local carriers of the pure-python runtime (the Google
   Cloud SDK ships one under ``platform/google_appengine``).

A candidate root is accepted only if BOTH the runtime and pyspark's
generated ``StateMessage_pb2`` import successfully from it. Because the
gencode pyspark ships may be a minor version ahead of the found runtime
(e.g. gencode 6.33 on runtime 6.32 — wire-compatible, but rejected by
protobuf's strict same-or-newer-runtime policy), the probe sets
protobuf's own documented escape hatch
``TEMPORARILY_DISABLE_PROTOBUF_VERSION_CHECK`` for the process tree; the
end-to-end test (``tests/test_streaming.py``) then proves actual
wire-level compatibility rather than assuming it.

Worker propagation: Spark python workers inherit the driver's
``PYTHONPATH`` and environment (local mode: the JVM is spawned from this
process and spawns the workers), so the accepted root is also prepended
to ``os.environ['PYTHONPATH']``. ``ensure_protobuf()`` must therefore
run BEFORE the JVM starts — ``session.build_spark`` calls it.
"""

from __future__ import annotations

import importlib
import os
import sys

# Public, locally-present carriers of the pure-python protobuf runtime.
_KNOWN_ROOTS = (
    "/usr/lib/google-cloud-sdk/platform/google_appengine",
)

_resolved: bool | None = None


def _runtime_importable() -> bool:
    try:
        importlib.import_module("google.protobuf")
        importlib.import_module("pyspark.sql.streaming.proto.StateMessage_pb2")
        return True
    except Exception:
        return False


def _forget_google_modules() -> None:
    for name in [n for n in sys.modules if n == "google" or n.startswith("google.")]:
        del sys.modules[name]
    sys.modules.pop("pyspark.sql.streaming.proto.StateMessage_pb2", None)


def ensure_protobuf() -> bool:
    """Make ``google.protobuf`` importable here and in spark workers.

    Returns True if the runtime (and pyspark's TWS gencode) import;
    False if no usable runtime exists — callers gate TWS execution on
    this, everything else is unaffected.
    """
    global _resolved
    if _resolved is not None:
        return _resolved

    if _runtime_importable():
        # a properly installed, version-matched runtime: leave protobuf's
        # gencode/runtime compatibility guard fully enabled for the
        # whole process (setting the escape hatch here would disable it
        # for every protobuf user in the process, not just TWS)
        _resolved = True
        return True

    # protobuf's own escape hatch for gencode-minor > runtime-minor; only
    # now that the direct import failed and we probe fallback roots whose
    # pure-python runtime may trail pyspark's gencode. Must be in the
    # environment before any pb2 import, driver or worker.
    os.environ.setdefault("TEMPORARILY_DISABLE_PROTOBUF_VERSION_CHECK", "true")
    _forget_google_modules()
    if _runtime_importable():
        # same runtime, previously rejected only by the version check
        _resolved = True
        return True

    candidates = []
    env_root = os.environ.get("SPARK_GRAFT_PROTOBUF_ROOT")
    if env_root:
        candidates.append(env_root)
    candidates.extend(_KNOWN_ROOTS)

    for root in candidates:
        if not os.path.isfile(os.path.join(root, "google", "protobuf", "__init__.py")):
            continue
        sys.path.insert(0, root)
        _forget_google_modules()
        if _runtime_importable():
            prev = os.environ.get("PYTHONPATH", "")
            if root not in prev.split(os.pathsep):
                os.environ["PYTHONPATH"] = (
                    root + (os.pathsep + prev if prev else "")
                )
            _resolved = True
            return True
        sys.path.remove(root)
        _forget_google_modules()

    _resolved = False
    return False
