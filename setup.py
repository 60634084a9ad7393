"""Packaging for common_tpu.

Reference analog: common:setup.py + CMakeLists.txt (Cython ext +
libmicroscopes_common.so).  Here the only host-native component is
common_tpu/native/partition.cpp (the exact-enumeration oracle's hot
host-side ops), which is normally JIT-compiled on first import via g++
(common_tpu/native/__init__.py).  `python setup.py build_native` prebuilds
it into the package so installs on toolchain-less machines still get the
native path.
"""

import os
import subprocess

from setuptools import Command, setup


class build_native(Command):
    """Prebuild the ctypes shared library next to the package source."""

    description = "compile common_tpu/native/*.cpp with g++"
    user_options = []

    def initialize_options(self):
        pass

    def finalize_options(self):
        pass

    def run(self):
        import hashlib

        here = os.path.dirname(os.path.abspath(__file__))
        srcs = [
            os.path.join(here, "common_tpu", "native", n)
            for n in ("partition.cpp", "loader.cpp")
        ]
        out = os.path.join(here, "common_tpu", "native", "partition_prebuilt.so")
        cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", src, "-o", out]
        print(" ".join(cmd))
        subprocess.run(cmd, check=True)
        # sidecar hash so the loader can detect a stale prebuilt
        with open(src, "rb") as f:
            tag = hashlib.sha256(f.read()).hexdigest()[:16]
        with open(out + ".hash", "w") as f:
            f.write(tag + "\n")


setup(cmdclass={"build_native": build_native})
