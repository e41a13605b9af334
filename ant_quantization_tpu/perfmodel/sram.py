"""Native SRAM energy model bindings (csrc/sram_model.cc via ctypes), with
an identical-formula Python fallback when the shared object isn't built."""

from __future__ import annotations

import ctypes
import os

_LIB = None
_TRIED = False


def _lib():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    root = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    path = os.path.join(root, "csrc", "libsram_model.so")
    if os.path.exists(path):
        lib = ctypes.CDLL(path)
        for f in ("sram_read_energy_nj", "sram_write_energy_nj",
                  "sram_leak_power_mw", "sram_area_mm2"):
            fn = getattr(lib, f)
            fn.restype = ctypes.c_double
            fn.argtypes = [ctypes.c_double, ctypes.c_double, ctypes.c_int]
        _LIB = lib
    return _LIB


# calibration anchors + exponents — keep in sync with csrc/sram_model.cc
_RD_SIZE_EXP, _WR_SIZE_EXP, _LEAK_SIZE_EXP = 0.0729, 0.2902, 0.8905
_RD_BLOCK_EXP, _WR_BLOCK_EXP = 1.3735, 1.2176
_PORT_ENERGY, _PORT_LEAK = 1.4, 1.3


def _py_read(s, b, p):
    e = 0.0168924 * (s / 4096.0) ** _RD_SIZE_EXP * (b / 64.0) ** _RD_BLOCK_EXP
    return e * _PORT_ENERGY if p else e


def _py_write(s, b, p):
    e = 0.0203422 * (s / 4096.0) ** _WR_SIZE_EXP * (b / 64.0) ** _WR_BLOCK_EXP
    return e * _PORT_ENERGY if p else e


def _py_leak(s, b, p):
    v = 2.96594 * (s / 4096.0) ** _LEAK_SIZE_EXP
    return v * _PORT_LEAK if p else v


def _py_area(s, b, p):
    a = 0.04606650594 * (s / 4096.0) ** 0.95
    return a * 1.35 if p else a


def sram_area_mm2(size_bytes: float, block_bytes: float = 64.0,
                  ports: int = 0) -> float:
    """Bank area, mm^2 (same fit as csrc/sram_model.cc:sram_area_mm2)."""
    lib = _lib()
    if lib is not None:
        return lib.sram_area_mm2(size_bytes, block_bytes, ports)
    return _py_area(size_bytes, block_bytes, ports)


def sram_bank_model(size_bytes: float, block_bytes: float, ports: int):
    """(read nJ/access, write nJ/access, leak mW/bank)."""
    lib = _lib()
    if lib is not None:
        return (lib.sram_read_energy_nj(size_bytes, block_bytes, ports),
                lib.sram_write_energy_nj(size_bytes, block_bytes, ports),
                lib.sram_leak_power_mw(size_bytes, block_bytes, ports))
    return (_py_read(size_bytes, block_bytes, ports),
            _py_write(size_bytes, block_bytes, ports),
            _py_leak(size_bytes, block_bytes, ports))
