"""Locate/build the native C-ABI shared libraries.

Resolution order (used by oracle/native.py and io/bridge.py):
1. the packaged copy (`autonomous_racing_lpv_mpp_mpc_tpu/native/<lib>`,
   installed by setup.py's build_ext), then
2. the source checkout (`<repo>/native/<lib>`), building it there with
   `make` on first use when only sources are present.
"""

from __future__ import annotations

import os
import subprocess

_PKG_DIR = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_PKG_NATIVE = os.path.join(_PKG_DIR, "native")
_SRC_NATIVE = os.path.join(os.path.dirname(_PKG_DIR), "native")


class NativeLibUnavailable(RuntimeError):
    pass


def find_native_lib(lib: str, make_target: str) -> str:
    """Return the path of shared library ``lib``, building if needed."""
    packaged = os.path.join(_PKG_NATIVE, lib)
    if os.path.exists(packaged):
        return packaged
    src = os.path.join(_SRC_NATIVE, lib)
    if os.path.exists(src):
        return src
    if os.path.isdir(_SRC_NATIVE):
        try:
            subprocess.run(
                ["make", "-C", _SRC_NATIVE, make_target],
                check=True, capture_output=True, text=True,
            )
        except (subprocess.CalledProcessError, FileNotFoundError) as e:
            raise NativeLibUnavailable(f"cannot build {lib}: {e}") from e
        if os.path.exists(src):
            return src
    raise NativeLibUnavailable(
        f"{lib} not found in {_PKG_NATIVE} or {_SRC_NATIVE}")
