# Test-only shim (see tests/protobuf_compat.py): extend this package's
# search path with the pure-Python protobuf runtime bundled in the
# machine's google-cloud-sdk (Apache/BSD-licensed public protobuf
# sources). Every real module (descriptor, message, internal.*) loads
# from there; only ``runtime_version`` is shadowed by the sibling module
# here, which relaxes the gencode-newer-than-runtime check (6.33 gencode
# on the 6.32 runtime — wire format identical) so pyspark's
# StateMessage_pb2 can load. NEVER used when a real protobuf install is
# importable, and never shipped as part of the package.

import os

_REAL = "/usr/lib/google-cloud-sdk/platform/google_appengine/google/protobuf"
if os.path.isdir(_REAL):
    __path__.append(_REAL)

__version__ = "6.32.0"
