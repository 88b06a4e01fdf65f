"""Build the native runtime: ``python -m interactive_vit_tpu.runtime.build``.

Compiles the C++ sources into ``_ivt_native.so`` next to this module with
g++ (no cmake ceremony for a two-file library; the flags matter more than
the build system). Also invoked lazily by ``runtime.native`` on first import
when the .so is missing or stale.
"""

from __future__ import annotations

import os
import subprocess

HERE = os.path.dirname(os.path.abspath(__file__))
SOURCES = ["wirecodec.cpp", "dataloader.cpp"]
SO_PATH = os.path.join(HERE, "_ivt_native.so")


def is_stale() -> bool:
    if not os.path.exists(SO_PATH):
        return True
    so_mtime = os.path.getmtime(SO_PATH)
    try:
        return any(
            os.path.getmtime(os.path.join(HERE, s)) > so_mtime
            for s in SOURCES
        )
    except OSError:
        # sources stripped from the install (wheel without .cpp): the
        # shipped .so is all there is — use it rather than disabling the
        # native tier
        return False


def build(verbose: bool = False) -> str:
    # compile to a temp path and os.replace: concurrent builders (server +
    # tests after a source edit) must never dlopen a half-written .so
    tmp = SO_PATH + f".tmp.{os.getpid()}"
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", "-std=c++17",
        # -pthread: dataloader.cpp uses std::thread/condition_variable;
        # without it, hosts with glibc < 2.34 fail dlopen or throw
        # std::system_error on the first thread construction
        "-march=native", "-pthread", "-o", tmp,
    ] + [os.path.join(HERE, s) for s in SOURCES]
    res = subprocess.run(cmd, capture_output=True, text=True)
    if res.returncode != 0:
        raise RuntimeError(f"native build failed:\n{res.stderr}")
    os.replace(tmp, SO_PATH)
    if verbose:
        print(f"built {SO_PATH}")
    return SO_PATH


if __name__ == "__main__":
    build(verbose=True)
