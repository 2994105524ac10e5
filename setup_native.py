"""Build the native C++ host kernels (tpu_amg/ops/native_src) into a
shared library loaded via ctypes.

Usage: python setup_native.py
"""

import subprocess
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent
SRC = ROOT / "tpu_amg" / "ops" / "native_src" / "amg_native.cc"
OUT = ROOT / "tpu_amg" / "ops" / "libamg_native.so"


def build() -> bool:
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
        "-pthread", str(SRC), "-o", str(OUT),
    ]
    print(" ".join(cmd))
    result = subprocess.run(cmd, capture_output=True, text=True)
    if result.returncode != 0:
        print(result.stderr, file=sys.stderr)
        return False
    print(f"built {OUT}")
    return True


if __name__ == "__main__":
    sys.exit(0 if build() else 1)
