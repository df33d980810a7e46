# Test-only shadow of google.protobuf.runtime_version (see the package
# __init__): same public API, but a gencode version slightly newer than
# the bundled runtime logs a warning instead of raising — the cross-minor
# wire format is identical, which is all the TWS state protocol needs.

from __future__ import annotations

import warnings
from enum import Enum


class Domain(Enum):
    GOOGLE_INTERNAL = 1
    PUBLIC = 2


OSS_DOMAIN = Domain.PUBLIC
OSS_MAJOR = 6
OSS_MINOR = 32
OSS_PATCH = 0
OSS_SUFFIX = "-dev"

DOMAIN = OSS_DOMAIN
MAJOR = OSS_MAJOR
MINOR = OSS_MINOR
PATCH = OSS_PATCH
SUFFIX = OSS_SUFFIX


class VersionError(Exception):
    """Exception class for version violation."""


def ValidateProtobufRuntimeVersion(
    gen_domain, gen_major, gen_minor, gen_patch, gen_suffix, location
):
    if gen_major != MAJOR:
        raise VersionError(
            f"Gencode major {gen_major} incompatible with runtime major "
            f"{MAJOR} loading {location}"
        )
    if (gen_minor, gen_patch) > (MINOR, PATCH):
        warnings.warn(
            f"protobuf gencode {gen_major}.{gen_minor}.{gen_patch} is newer "
            f"than the shimmed runtime {MAJOR}.{MINOR}.{PATCH} "
            f"(loading {location}); proceeding — test-only shim",
            stacklevel=2,
        )
