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
# -march=native makes the .so machine-specific; the marker records the
# building CPU so a prebuilt .so is never dlopen'ed on a different
# micro-architecture (first call would SIGILL — uncatchable)
MARKER_PATH = SO_PATH + ".cpu"


def _cpu_id() -> str:
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("model name"):
                    return line.split(":", 1)[1].strip()
    except OSError:
        pass
    return "unknown"


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
        # shipped .so is all there is — usable only if it was built on
        # this CPU model (-march=native); otherwise signal stale so the
        # caller's build() fails cleanly and native.py falls back to the
        # Python paths instead of SIGILLing on the first call
        try:
            with open(MARKER_PATH) as f:
                return f.read().strip() != _cpu_id()
        except OSError:
            return True


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
    with open(MARKER_PATH, "w") as f:
        f.write(_cpu_id() + "\n")
    if verbose:
        print(f"built {SO_PATH}")
    return SO_PATH


if __name__ == "__main__":
    build(verbose=True)
