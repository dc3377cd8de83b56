// Native gapped ydrop extension (LASTZ-delegation replacement).
//
// The reference performs gapped extension by shelling out to LASTZ
// (/root/reference/scripts/run_segalign:112-117); when lastz is not
// installed, segalign_tpu uses this native implementation instead: an
// adaptive-banded affine-gap DP with ydrop pruning, extended left+right from
// each anchor, functionally equivalent to lastz's gapped stage (NOT
// byte-identical; delegation mode remains the byte-compat path).
//
// Alphabet here is the gapped-stage coding: A=0 C=1 G=2 T=3 (case folded),
// N=4, other=5, '&' separator=6 (impassable wall).
//
// Memory: per row we retain only the backpointer bytes (1 B/cell) plus the
// band offset; cell scores roll. Pruned cells are fully zapped so no later
// transition can source from them, keeping traceback inside stored bands.

#include <algorithm>
#include <cstdint>
#include <vector>

namespace {

constexpr int64_t NEG_INF = INT64_MIN / 4;
constexpr uint8_t BP_M_FROM_I = 0x01;  // M's diagonal predecessor was I
constexpr uint8_t BP_M_FROM_D = 0x02;  // ... was D (else M)
constexpr uint8_t BP_I_FROM_I = 0x10;  // I extends an existing I
constexpr uint8_t BP_D_FROM_D = 0x20;  // D extends an existing D

struct Cell {
    int64_t m, ins, del;
};

struct BpRow {
    int64_t lo = 0;
    std::vector<uint8_t> bp;
};

struct ExtResult {
    int64_t score = 0;
    int64_t r_ext = 0;
    int64_t q_ext = 0;
    std::vector<uint8_t> ops;  // 'M','I','D', ordered anchor -> far end
};

struct Dp {
    const uint8_t* ref;
    int64_t ref_len;
    const uint8_t* query;
    int64_t query_len;
    const int64_t* sub;  // 8x8 row-major
    int64_t gap_open, gap_extend, ydrop;
};

ExtResult extend_dir(const Dp& dp, int64_t r0, int64_t q0, int dir) {
    auto rch = [&](int64_t j) -> int {  // ref char at offset j >= 1
        int64_t p = (dir > 0) ? r0 + j - 1 : r0 - j;
        if (p < 0 || p >= dp.ref_len) return 6;
        return dp.ref[p];
    };
    auto qch = [&](int64_t i) -> int {
        int64_t p = (dir > 0) ? q0 + i - 1 : q0 - i;
        if (p < 0 || p >= dp.query_len) return 6;
        return dp.query[p];
    };
    int64_t max_r = (dir > 0) ? dp.ref_len - r0 : r0;
    int64_t max_q = (dir > 0) ? dp.query_len - q0 : q0;
    if (max_r < 0) max_r = 0;
    if (max_q < 0) max_q = 0;

    int64_t best = 0, best_i = 0, best_j = 0;

    std::vector<BpRow> history;
    std::vector<Cell> prev;       // cells of the previous row (band-local)
    int64_t prev_lo = 0;

    // ---- row 0: pure D chain along the reference
    {
        BpRow row;
        row.lo = 0;
        prev.clear();
        prev.push_back(Cell{0, NEG_INF, NEG_INF});
        row.bp.push_back(0);
        for (int64_t j = 1; j <= max_r; j++) {
            if (rch(j) == 6) break;
            const Cell& l = prev.back();
            int64_t open_s = l.m - dp.gap_open - dp.gap_extend;
            int64_t ext_s = l.del - dp.gap_extend;
            int64_t d = std::max(open_s, ext_s);
            if (d < best - dp.ydrop || d <= NEG_INF / 2) break;
            prev.push_back(Cell{NEG_INF, NEG_INF, d});
            row.bp.push_back(ext_s > open_s ? BP_D_FROM_D : 0);
        }
        prev_lo = 0;
        history.push_back(std::move(row));
    }

    for (int64_t i = 1; i <= max_q; i++) {
        if (qch(i) == 6) break;
        int qc = qch(i);
        int64_t phi = prev_lo + (int64_t)prev.size() - 1;
        int64_t nlo = prev_lo;
        int64_t nhi = std::min(phi + 1, max_r);
        if (nlo > nhi) break;

        std::vector<Cell> cur;
        std::vector<uint8_t> bps;
        cur.reserve(nhi - nlo + 2);
        int64_t first_keep = -1, last_keep = -1;

        for (int64_t j = nlo; j <= nhi; j++) {
            Cell c{NEG_INF, NEG_INF, NEG_INF};
            uint8_t bp = 0;
            int rc = (j >= 1) ? rch(j) : 6;

            // M from (i-1, j-1)
            if (j >= 1 && rc != 6 && j - 1 >= prev_lo && j - 1 <= phi) {
                const Cell& d = prev[j - 1 - prev_lo];
                int64_t b = std::max({d.m, d.ins, d.del});
                if (b > NEG_INF / 2) {
                    c.m = b + dp.sub[rc * 8 + qc];
                    if (d.ins >= d.m && d.ins >= d.del) bp |= BP_M_FROM_I;
                    else if (d.del >= d.m && d.del > d.ins) bp |= BP_M_FROM_D;
                }
            }
            // I from (i-1, j)
            if (j >= prev_lo && j <= phi) {
                const Cell& u = prev[j - prev_lo];
                int64_t open_s = u.m - dp.gap_open - dp.gap_extend;
                int64_t ext_s = u.ins - dp.gap_extend;
                int64_t v = std::max(open_s, ext_s);
                if (v > NEG_INF / 2) {
                    c.ins = v;
                    if (ext_s > open_s) bp |= BP_I_FROM_I;
                }
            }
            // D from (i, j-1) within this row
            if (j > nlo && rc != 6 && !cur.empty()) {
                const Cell& l = cur.back();
                int64_t open_s = l.m - dp.gap_open - dp.gap_extend;
                int64_t ext_s = l.del - dp.gap_extend;
                int64_t v = std::max(open_s, ext_s);
                if (v > NEG_INF / 2) {
                    c.del = v;
                    if (ext_s > open_s) bp |= BP_D_FROM_D;
                }
            }

            int64_t sc = std::max({c.m, c.ins, c.del});
            if (sc < best - dp.ydrop || sc <= NEG_INF / 2) {
                // prune: zap so nothing can source from this cell
                c = Cell{NEG_INF, NEG_INF, NEG_INF};
                bp = 0;
            } else {
                if (first_keep < 0) first_keep = j;
                last_keep = j;
                if (c.m > best) { best = c.m; best_i = i; best_j = j; }
            }
            cur.push_back(c);
            bps.push_back(bp);
        }
        if (first_keep < 0) break;

        BpRow row;
        row.lo = first_keep;
        row.bp.assign(bps.begin() + (first_keep - nlo),
                      bps.begin() + (last_keep - nlo) + 1);
        history.push_back(std::move(row));
        prev.assign(cur.begin() + (first_keep - nlo),
                    cur.begin() + (last_keep - nlo) + 1);
        prev_lo = first_keep;
    }

    ExtResult out;
    out.score = best;
    out.r_ext = best_j;
    out.q_ext = best_i;
    int64_t i = best_i, j = best_j;
    int state = 0;  // 0=M 1=I 2=D
    std::vector<uint8_t> ops;
    while (i > 0 || j > 0) {
        const BpRow& row = history[i];
        uint8_t bp = row.bp[j - row.lo];
        if (state == 0 && i > 0 && j > 0) {
            ops.push_back('M');
            state = (bp & BP_M_FROM_I) ? 1 : (bp & BP_M_FROM_D) ? 2 : 0;
            i--; j--;
        } else if (state == 1 || (state == 0 && j == 0)) {
            ops.push_back('I');
            state = (bp & BP_I_FROM_I) ? 1 : 0;
            i--;
        } else {
            ops.push_back('D');
            state = (bp & BP_D_FROM_D) ? 2 : 0;
            j--;
        }
    }
    std::reverse(ops.begin(), ops.end());
    out.ops = std::move(ops);
    return out;
}

}  // namespace

extern "C" {

// Gapped extension from one anchor. ops_out receives the edit script
// ('M','I','D'); returns its length or -1 if it exceeds ops_cap.
// meta_out = {score, r_start, q_start, r_end, q_end} (half-open, 0-based).
int64_t gapped_extend(
    const uint8_t* ref, int64_t ref_len, const uint8_t* query,
    int64_t query_len, const int64_t* sub8x8, int64_t gap_open,
    int64_t gap_extend, int64_t ydrop, int64_t anchor_r, int64_t anchor_q,
    uint8_t* ops_out, int64_t ops_cap, int64_t* meta_out) {
    Dp dp{ref, ref_len, query, query_len, sub8x8, gap_open, gap_extend,
          ydrop};
    ExtResult right = extend_dir(dp, anchor_r, anchor_q, +1);
    ExtResult left = extend_dir(dp, anchor_r, anchor_q, -1);

    int64_t total = (int64_t)(left.ops.size() + right.ops.size());
    if (total > ops_cap) return -1;
    int64_t k = 0;
    for (auto it = left.ops.rbegin(); it != left.ops.rend(); ++it)
        ops_out[k++] = *it;
    for (uint8_t op : right.ops) ops_out[k++] = op;

    meta_out[0] = left.score + right.score;
    meta_out[1] = anchor_r - left.r_ext;
    meta_out[2] = anchor_q - left.q_ext;
    meta_out[3] = anchor_r + right.r_ext;
    meta_out[4] = anchor_q + right.q_ext;
    return total;
}

}  // extern "C"
