"""Build the native C++ helper: `python -m slimm_tpu.io.native_build`."""

from __future__ import annotations

import os
import subprocess
import sys


def build(verbose: bool = True) -> str:
    repo_root = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    native_dir = os.path.join(repo_root, "native")
    if not os.path.exists(os.path.join(native_dir, "Makefile")):
        raise FileNotFoundError(f"native sources not found at {native_dir}")
    subprocess.run(["make", "-C", native_dir],
                   check=True,
                   stdout=None if verbose else subprocess.DEVNULL)
    from .native import _LIB_PATH
    return _LIB_PATH


if __name__ == "__main__":
    path = build()
    print(f"built {path}", file=sys.stderr)
