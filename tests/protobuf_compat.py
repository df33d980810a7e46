"""Best-effort enablement of the protobuf runtime the TWS state protocol
needs (streaming/tws.py docstring: transformWithStateInPandas workers
speak protobuf to the JVM state server).

The build container ships no ``protobuf`` package and installs are not
allowed — but the machine's google-cloud-sdk bundles the pure-Python
protobuf runtime (public Apache/BSD protobuf sources). When the real
package is missing, ``ensure_protobuf`` puts a small shim
(tests/_vendor_shim) on ``sys.path`` AND ``PYTHONPATH`` — the env var
must be set BEFORE the Spark JVM launches so python workers inherit it —
that routes ``google.protobuf`` to that runtime, with only the
gencode-version gate relaxed (see the shim files). Environments with a
real protobuf install are untouched; environments with neither keep the
documented skip.
"""

from __future__ import annotations

import os
import sys

_GCLOUD_RUNTIME = "/usr/lib/google-cloud-sdk/platform/google_appengine"
_SHIM = os.path.join(os.path.dirname(os.path.abspath(__file__)), "_vendor_shim")


def ensure_protobuf() -> bool:
    """True when ``google.protobuf`` + pyspark's StateMessage_pb2 load."""
    try:
        import google.protobuf  # noqa: F401
    except ImportError:
        if not os.path.isdir(os.path.join(_GCLOUD_RUNTIME, "google", "protobuf")):
            return False
        if _SHIM not in sys.path:
            sys.path.insert(0, _SHIM)
            os.environ["PYTHONPATH"] = (
                _SHIM + os.pathsep + os.environ.get("PYTHONPATH", "")
            )
    try:
        from pyspark.sql.streaming.proto import StateMessage_pb2  # noqa: F401

        return True
    except Exception:  # noqa: BLE001 — any load failure means "not usable"
        return False
