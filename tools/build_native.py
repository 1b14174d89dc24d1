#!/usr/bin/env python
"""Build the native geometry core (g++ -> native/libplankgeom.so)."""
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SRC = os.path.join(ROOT, "native", "geometry.cpp")
OUT = os.path.join(ROOT, "native", "libplankgeom.so")


def build(verbose: bool = True) -> str:
    cmd = ["g++", "-O2", "-shared", "-fPIC", "-std=c++17", SRC, "-o", OUT]
    if verbose:
        print(" ".join(cmd))
    subprocess.run(cmd, check=True)
    return OUT


if __name__ == "__main__":
    build()
    print(f"built {OUT}")
    sys.exit(0)
