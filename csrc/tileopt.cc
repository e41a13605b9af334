// Exhaustive tiling + loop-order search for the accelerator cycle model.
//
// Native core of perfmodel/model.py: evaluates every (loop order x pow2
// tiling) candidate with exact 64-bit integer arithmetic and returns the
// best-cycles (tie: best-energy) layer stats. The reference implements
// this as a Python multiprocessing pool over 120 loop orders
// (ant_simulator/bitfusion/src/optimizer/optimizer.py:208-253); this is a
// single-threaded C++ loop that covers the same space in microseconds.
//
// Exposed C ABI (ctypes): tileopt_conv(...) fills a 10-slot double array:
//   [cycles, stalls, rd_act, rd_wgt, rd_out, rd_dram, wr_act, wr_wgt,
//    wr_out, wr_dram]

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <limits>

namespace {

using i64 = long long;

inline i64 ceil_div(i64 a, i64 b) { return (a + b - 1) / b; }

struct Acc {
    i64 n, m, pmax, pmin;
    i64 sram_act, sram_wgt, sram_out;  // bytes
    i64 if_width;
    i64 perf(i64 prec) const { return pmax / std::max(prec, pmin); }
};

struct Energy {
    double core_leak, core_dyn;
    double wbuf_rd, wbuf_wr, ibuf_rd, ibuf_wr, obuf_rd, obuf_wr;
    double sram_leak;
};

constexpr int kLoops = 5;  // B, OW, OH, IC, OC
// tile_deps[loop][{act,wgt,out}] (optimizer.py:18-23)
constexpr bool kDeps[kLoops][3] = {
    {true, false, true},   // B
    {true, false, true},   // OW
    {true, false, true},   // OH
    {true, true, false},   // IC
    {false, true, true},   // OC
};
constexpr i64 kOprec = 16;

struct Best {
    double cycles = std::numeric_limits<double>::infinity();
    double energy = std::numeric_limits<double>::infinity();
    double stalls = 0;
    double rd[4] = {0, 0, 0, 0};   // act wgt out dram
    double wr[4] = {0, 0, 0, 0};
};

void eval_order(const Acc& acc, const Energy& en, const int* order,
                i64 K, i64 /*O*/, i64 IC_t, i64 OC_t,
                i64 b, i64 ow, i64 oh, i64 ic, i64 oc,
                const i64 nums[kLoops], i64 iprec, i64 wprec,
                bool weight_stationary, Best* best) {
    const i64 pf_i = acc.perf(iprec), pf_w = acc.perf(wprec);

    double writes[3];  // act wgt out (bits resident per tile)
    double reads_out;
    writes[1] = double(ceil_div(K * K * ic, acc.n * pf_w)) * acc.n * pf_w
                * oc * wprec;
    writes[0] = double(ow * oh) * ceil_div(K * K * ic, acc.m * pf_i)
                * acc.m * pf_i * b * iprec;
    writes[2] = 0.0;
    reads_out = double(ow * oh * oc * b) * kOprec;

    const double caps[3] = {acc.sram_act * 8.0 / 2, acc.sram_wgt * 8.0 / 2,
                            acc.sram_out * 8.0 / 2};
    if (writes[0] > caps[0] || writes[1] > caps[1]) return;

    double max_w[3] = {writes[0], writes[1], writes[2]};
    double max_r_out = reads_out;
    bool w_prom[3] = {true, true, true};
    bool r_prom_out = true;

    for (int li = kLoops - 1; li >= 0; --li) {
        const int loop = order[li];
        const double nt = double(nums[loop]);
        for (int ns = 0; ns < 3; ++ns) {
            if (w_prom[ns]) {
                if (kDeps[loop][ns]) {
                    writes[ns] *= nt;
                    if (writes[ns] > caps[ns]) w_prom[ns] = false;
                    else max_w[ns] = writes[ns];
                }
            } else {
                writes[ns] *= nt;
            }
        }
        if (r_prom_out) {
            if (kDeps[loop][2]) {
                reads_out *= nt;
                if (reads_out > caps[2]) r_prom_out = false;
                else max_r_out = writes[2];  // reference quirk (:137)
            }
        } else {
            reads_out *= nt;
        }
    }

    const double dram_rd = writes[0] + writes[1] + writes[2];
    const double dram_wr = reads_out;
    const double initial = max_w[0] + max_w[1] + max_w[2];
    const double final_w = max_r_out;
    const double latency = std::ceil(initial / acc.if_width)
                         + std::ceil(final_w / acc.if_width);
    const double middle = dram_rd + dram_wr - initial - final_w;
    const double mem_cycles = std::ceil(middle / acc.if_width);

    double num_tiles = 1;
    for (int l = 0; l < kLoops; ++l) num_tiles *= double(nums[l]);

    const i64 ni = K * K * ic;
    const i64 no = oc;
    const i64 batch = b * oh * ow;
    double tile_cycles;
    if (weight_stationary)
        tile_cycles = double(batch) * ceil_div(no, acc.m * pf_w)
                      * ceil_div(ni, acc.n * pf_i);
    else
        tile_cycles = double(ceil_div(batch, acc.n * pf_i))
                      * ceil_div(no, acc.m * pf_w) * ni;
    const double compute = num_tiles * tile_cycles;
    const double stalls = std::max(0.0, mem_cycles - compute) + latency;
    const double total = compute + stalls;

    // SRAM inner-loop traffic (optimizer.py:162-175)
    double sr_act, sr_wgt, sr_out, sw_out;
    if (weight_stationary) {
        const double t = num_tiles * double(K * K * ic * oc)
                         * double(b * ow * oh);
        sr_act = t * iprec;
        sr_out = t * kOprec;
        sw_out = t * kOprec;
        sr_wgt = num_tiles * double(K * K * ic * oc) * wprec;
    } else {
        const double t = num_tiles * double(oc * oh * ow * b);
        sr_act = t * double(K * K * ic) * iprec;
        sw_out = t * kOprec;
        sr_wgt = t * double(K * K * ic) * wprec;
        sr_out = t * kOprec;
    }

    // energy (stats.py:58-80)
    const double dram_leak = 3838.05 / 500000;
    double e = total * (en.core_leak + en.sram_leak + dram_leak);
    e += (total - stalls) * en.core_dyn;
    e += sr_wgt * en.wbuf_rd + writes[1] * en.wbuf_wr;
    e += sr_act * en.ibuf_rd + writes[0] * en.ibuf_wr;
    e += (sr_out + reads_out) * en.obuf_rd + (sw_out + writes[2]) * en.obuf_wr;
    e += dram_rd * (1.18294 / 1024) + dram_wr * (1.47797 / 1024);

    if (total < best->cycles
        || (total == best->cycles && e < best->energy)) {
        best->cycles = total;
        best->energy = e;
        best->stalls = stalls;
        best->rd[0] = sr_act;
        best->rd[1] = sr_wgt;
        best->rd[2] = sr_out + reads_out;
        best->rd[3] = dram_rd;
        best->wr[0] = writes[0];
        best->wr[1] = writes[1];
        best->wr[2] = sw_out + writes[2];
        best->wr[3] = dram_wr;
    }
}

}  // namespace

extern "C" int tileopt_conv(
    // accelerator
    long long n, long long m, long long pmax, long long pmin,
    long long sram_act, long long sram_wgt, long long sram_out,
    long long if_width,
    // layer
    long long K, long long O, long long S, long long IC, long long OC,
    long long B, long long iprec, long long wprec, int weight_stationary,
    // energy params
    const double* ep,
    // out[10]
    double* out) {
    Acc acc{n, m, pmax, pmin, sram_act, sram_wgt, sram_out, if_width};
    Energy en{ep[0], ep[1], ep[2], ep[3], ep[4], ep[5], ep[6], ep[7], ep[8]};

    int perm[kLoops] = {0, 1, 2, 3, 4};
    Best best;

    const int nB = B > 1 ? int(std::ceil(std::log2(double(B)))) + 1 : 1;
    const int nO = O > 1 ? int(std::ceil(std::log2(double(O)))) + 1 : 1;
    const int nIC = IC > 1 ? int(std::ceil(std::log2(double(IC)))) + 1 : 1;
    const int nOC = OC > 1 ? int(std::ceil(std::log2(double(OC)))) + 1 : 1;

    std::sort(perm, perm + kLoops);
    do {
        for (int _b = 0; _b < nB; ++_b) {
            const i64 b = std::min<i64>(1LL << _b, B);
            for (int _o = 0; _o < nO; ++_o) {
                const i64 ow = std::min<i64>(1LL << _o, O);
                for (int _ic = 0; _ic < nIC; ++_ic) {
                    const i64 ic = std::min<i64>(1LL << _ic, IC);
                    for (int _oc = 0; _oc < nOC; ++_oc) {
                        const i64 oc = std::min<i64>(1LL << _oc, OC);
                        const i64 nums[kLoops] = {
                            ceil_div(B, b), ceil_div(O, ow), ceil_div(O, ow),
                            ceil_div(IC, ic), ceil_div(OC, oc)};
                        eval_order(acc, en, perm, K, O, IC, OC, b, ow, ow,
                                   ic, oc, nums, iprec, wprec,
                                   weight_stationary != 0, &best);
                    }
                }
            }
        }
    } while (std::next_permutation(perm, perm + kLoops));

    if (!std::isfinite(best.cycles)) return 1;
    out[0] = best.cycles;
    out[1] = best.stalls;
    out[2] = best.rd[0];
    out[3] = best.rd[1];
    out[4] = best.rd[2];
    out[5] = best.rd[3];
    out[6] = best.wr[0];
    out[7] = best.wr[1];
    out[8] = best.wr[2];
    out[9] = best.wr[3];
    return 0;
}
