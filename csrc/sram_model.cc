// Analytical SRAM bank energy/leakage model (CACTI-style scaling laws).
//
// Native replacement for the reference's dependency on an external CACTI
// binary invoked via subprocess (ant_simulator/bitfusion/sram/
// cacti_sweep.py:79-93). For the bank geometries the accelerator model
// actually uses, measured 28nm values are tabulated in
// perfmodel/energy.py; this model extrapolates to arbitrary geometries
// with power-law scaling calibrated on those points:
//
//   read/write energy per access  ~ c * block_bits^be * size_bits^se
//   leakage power per bank        ~ c * size_bits^le
//
// Built as a shared object (make -C csrc) and loaded via ctypes; a Python
// fallback with identical formulas lives in perfmodel/sram.py.

#include <cmath>

extern "C" {

// Calibration anchors (28nm, 360K, itrs-hp):
//   bank 4096B block 64B: rd 0.0168924 nJ, wr 0.0203422 nJ, leak 2.96594 mW
//   bank 8192B block 64B: rd 0.0177688 nJ, wr 0.0248866 nJ, leak 5.4983 mW
//   bank  128B block  4B: rd 0.000294945 nJ, wr 0.000415925 nJ,
//                         leak 0.127708 mW

static const double RD_SIZE_EXP = 0.0729;   // log2(0.0177688/0.0168924)
static const double WR_SIZE_EXP = 0.2902;   // log2(0.0248866/0.0203422)
static const double LEAK_SIZE_EXP = 0.8905; // log2(5.4983/2.96594)

// block exponents from the (4096,64) vs (128,4) pair after removing the
// size dependence
static const double RD_BLOCK_EXP = 1.3735;
static const double WR_BLOCK_EXP = 1.2176;

// port penalty: dual-ported arrays cost ~1.4x energy, ~1.3x leakage
static const double PORT_ENERGY = 1.4;
static const double PORT_LEAK = 1.3;

static double anchor(double v, double size_b, double block_b,
                     double size_exp, double block_exp) {
    return v * std::pow(size_b / 4096.0, size_exp)
             * std::pow(block_b / 64.0, block_exp);
}

// read energy per access, nJ
double sram_read_energy_nj(double size_bytes, double block_bytes,
                           int rw_ports) {
    double e = anchor(0.0168924, size_bytes, block_bytes,
                      RD_SIZE_EXP, RD_BLOCK_EXP);
    return rw_ports > 0 ? e * PORT_ENERGY : e;
}

// write energy per access, nJ
double sram_write_energy_nj(double size_bytes, double block_bytes,
                            int rw_ports) {
    double e = anchor(0.0203422, size_bytes, block_bytes,
                      WR_SIZE_EXP, WR_BLOCK_EXP);
    return rw_ports > 0 ? e * PORT_ENERGY : e;
}

// leakage power per bank, mW
double sram_leak_power_mw(double size_bytes, double block_bytes,
                          int rw_ports) {
    double p = 2.96594 * std::pow(size_bytes / 4096.0, LEAK_SIZE_EXP);
    return rw_ports > 0 ? p * PORT_LEAK : p;
}

// bank area, mm^2 (density anchor: 4096B @ 0.046 mm^2)
double sram_area_mm2(double size_bytes, double block_bytes, int rw_ports) {
    double a = 0.04606650594 * std::pow(size_bytes / 4096.0, 0.95);
    return rw_ports > 0 ? a * 1.35 : a;
}

}  // extern "C"
