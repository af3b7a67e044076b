"""LAZ (compressed LAS) support gate.

The reference links LASzip (core/io/LASFile.cpp wraps laszip_api.h). A
LASzip-compatible arithmetic codec is a native component planned for this
framework's native/ tree; until it lands, LAZ paths raise a clear error so
uncompressed LAS flows are unaffected.
"""
from __future__ import annotations


class LAZNotAvailableError(RuntimeError):
    def __init__(self, path: str = ""):
        super().__init__(
            f"LAZ (compressed LAS) support requires the native LASzip codec, "
            f"which is not available in this build{': ' + path if path else ''}. "
            f"Use uncompressed LAS, or BIN/BINZ / 3DTILES outputs.")


class LAZReader:
    def __init__(self, path, header):
        raise LAZNotAvailableError(str(path))


def write_laz(path, header, records):
    raise LAZNotAvailableError(str(path))
