// Blocked (low-memory) BWT construction by rank-anchored block merge.
//
// Capability twin of the reference's BWT-SW incremental builder
// (FM_index/bwt_gen.c:1299 BWTIncConstruct): build the BWT of a
// multi-Gbp text without ever materializing its full suffix array.
// The ALGORITHM is not a port of bwt_gen.c (which grows a compressed
// suffix array with QSufSort'd text blocks); it is the classic
// backward-search merge, independently derived:
//
//   Text processed right-to-left in blocks: T_new = B . T_old.  The
//   old suffix order is unchanged; each NEW suffix B[j..].T_old gets
//   (a) its insertion rank r(j) among old suffixes by one LF step per
//       character (r(j) = L2[c] + occ(c, r(j+1)) + 1, anchored at
//       r(m) = primary — the rank of T_old itself), and
//   (b) its rank among the other new suffixes by suffix-sorting the
//       integer string K[j] = (B[j], 2*r(j)) with the virtual entry
//       K[m] = (T_old[0], 2*primary+1): comparing K position-wise
//       resolves every pair at its first difference (chars order
//       lexicographically; equal chars reduce to the tails; r is
//       monotone in suffix order and the odd key of the unique
//       virtual entry encodes "continuation vs T_old" exactly), so
//       one radix pass + Larsson-Sadakane doubling on the tie groups
//       gives the exact order.
//   Merge is then a linear interleave: new suffix j lands at merged
//   row r(j) + rank_new(j); the old $ slot (row `primary`) becomes a
//   real char B[m-1]; the new $ slot is the row of suffix 0.
//
// Everything is in the $-convention of the repo's in-core builder
// (index/build.py): stored BWT = pred-chars of all suffixes of T$ in
// order, with the row of suffix 0 (pred = $) removed and remembered
// as `primary`.  Output is byte-identical to the in-core SA-IS path
// (differential tests at 1-200 Mbp; hg19 SHA256 manifest).
//
// Memory: O(packed text + packed BWT + interleaved rank rows + one
// block's sort buffers) ~= 12 GB at hg19 scale vs ~80 GB for the
// in-core 64-bit SA-IS.

#include <cstdint>
#include <cstring>
#include <cstdlib>
#include <vector>
#include <algorithm>

typedef int64_t i64;
typedef uint64_t u64;
typedef uint32_t u32;
typedef uint8_t u8;

namespace {

// ---- packed-code access (pack_pac layout: 4 codes/byte, first code
// in the high bits — FM_index/bntseq.c:229)
static inline int get_code(const u8* p, i64 i) {
    return (p[i >> 2] >> (2 * (3 - (i & 3)))) & 3;
}
static inline void set_code(u8* p, i64 i, int c) {
    int sh = 2 * (3 - (i & 3));
    p[i >> 2] = (u8)((p[i >> 2] & ~(3 << sh)) | (c << sh));
}

// ---- per-byte packed counts: lut[b] has, in 4 u16 lanes, the number
// of codes 0..3 among byte b's 4 codes
static u64 CNT_LUT[256];
static bool lut_init_done = false;
static void lut_init() {
    if (lut_init_done) return;
    for (int b = 0; b < 256; b++) {
        u64 v = 0;
        for (int s = 0; s < 4; s++) {
            int c = (b >> (2 * s)) & 3;
            v += (u64)1 << (16 * c);
        }
        CNT_LUT[b] = v;
    }
    lut_init_done = true;
}

// ---- rank structure: interleaved rows, one per 256 stored chars:
// [4 x u64 cumulative counts][64 packed bytes] = 96 B (fits ~2 cache
// lines; one LF step touches one row — the same locality trick as the
// device occ_rows, ops/device_index.py)
struct RankIdx {
    std::vector<u64> rows;       // 12 u64 per block: 4 counts + 8 u64 of packed bytes
    i64 n;                       // stored chars
    void build(const u8* packed, i64 n_) {
        lut_init();
        n = n_;
        i64 nb = (n + 255) >> 8;
        rows.assign((size_t)(nb + 1) * 12, 0);
        u64 tot[4] = {0, 0, 0, 0};
        for (i64 b = 0; b < nb; b++) {
            u64* row = &rows[(size_t)b * 12];
            row[0] = tot[0]; row[1] = tot[1]; row[2] = tot[2]; row[3] = tot[3];
            u8* dst = (u8*)(row + 4);
            i64 byte0 = b << 6;
            i64 nbytes = std::min<i64>(64, ((n + 3) >> 2) - byte0);
            if (nbytes > 0) memcpy(dst, packed + byte0, (size_t)nbytes);
            // count whole block (trailing pad codes of the final
            // partial byte are code 0 of the SOURCE packing; they are
            // never inside [0, n) so ranks never read them, but the
            // cumulative totals must only cover real chars)
            i64 lo = b << 8, hi = std::min<i64>(lo + 256, n);
            u64 acc = 0;
            i64 i = lo;
            for (; i + 4 <= hi && (i & 3) == 0; i += 4)
                acc += CNT_LUT[packed[i >> 2]];
            for (; i < hi; i++)
                acc += (u64)1 << (16 * get_code(packed, i));
            tot[0] += acc & 0xFFFF;
            tot[1] += (acc >> 16) & 0xFFFF;
            tot[2] += (acc >> 32) & 0xFFFF;
            tot[3] += (acc >> 48) & 0xFFFF;
        }
        u64* row = &rows[(size_t)nb * 12];
        row[0] = tot[0]; row[1] = tot[1]; row[2] = tot[2]; row[3] = tot[3];
    }
    // # of code c among stored[0..k)
    inline u64 rank(int c, i64 k) const {
        const u64* row = &rows[(size_t)(k >> 8) * 12];
        u64 r = row[c];
        const u8* bytes = (const u8*)(row + 4);
        int rem = (int)(k & 255);
        u64 acc = 0;
        int nb = rem >> 2;
        for (int i = 0; i < nb; i++) acc += CNT_LUT[bytes[i]];
        r += (acc >> (16 * c)) & 0xFFFF;
        for (int i = nb << 2; i < rem; i++) {
            int cc = (bytes[i >> 2] >> (2 * (3 - (i & 3)))) & 3;
            r += (cc == c);
        }
        return r;
    }
    // stored char at position i
    inline int at(i64 i) const {
        const u64* row = &rows[(size_t)(i >> 8) * 12];
        const u8* bytes = (const u8*)(row + 4);
        int o = (int)(i & 255);
        return (bytes[o >> 2] >> (2 * (3 - (o & 3)))) & 3;
    }
};

}  // namespace

extern "C" {

// Merge a prepended block into an existing $-removed BWT.
//   bwt_packed  : N stored chars, pack_pac layout
//   primary     : row of the removed $ slot (rank of old suffix 0)
//   block       : m codes (0..3) of the block B, T_new = B . T_old
//   bwt_out     : (N+m) chars packed (caller-allocated, zeroed)
//   primary_out : new $ row
// Returns 0, or -1 on invalid arguments.
int cs_bwt_merge_block(const u8* bwt_packed, i64 N, i64 primary,
                       const u8* block, i64 m,
                       u8* bwt_out, i64* primary_out) {
    if (m <= 0 || N < 0 || primary < 0 || primary > N) return -1;
    if (m >= ((i64)1 << 28)) return -1;   // key<<28|j packing bound
    if (N + 1 >= ((i64)1 << 33)) return -1;  // r must fit 33 bits
    RankIdx ridx;
    ridx.build(bwt_packed, N);

    // L2[c] = # chars < c in T_old == # old suffixes starting < c
    u64 cnt[4];
    {
        const u64* last = &ridx.rows[(size_t)(((N + 255) >> 8)) * 12];
        for (int c = 0; c < 4; c++) cnt[c] = last[c];
    }
    u64 L2[5] = {0, 0, 0, 0, 0};
    for (int c = 0; c < 4; c++) L2[c + 1] = L2[c] + cnt[c];

    // ---- (a) insertion ranks among old suffixes, right-to-left.
    // r counts ALL old rows below the new suffix, including the bare-$
    // row 0 (hence the +1).  occ skips the old $ slot via the
    // k - (k > primary) stored-coordinate adjustment.
    std::vector<i64> r((size_t)m + 1);
    r[m] = primary;
    for (i64 j = m - 1; j >= 0; j--) {
        int c = block[j];
        i64 k = r[j + 1];
        i64 ks = k - (k > primary);            // stored coordinate
        r[j] = (i64)L2[c] + (i64)ridx.rank(c, ks) + 1;
    }

    // ---- (b) order among new suffixes: suffix sort of the integer
    // string K[j] = (c_j << 34) | 2*r(j), K[m] = (T_old[0]) << 34 |
    // (2*primary + 1).  r <= N+1 < 2^33 so 2r+1 < 2^34 and keys fit 36
    // bits; (key << 28) | j packs sort key + index into one u64 for
    // m < 2^28 — exactly 64 bits, guarded above.
    // the rank rows (0.37 B/char) are only needed for the LF loop above
    // and would otherwise sit under the sort/doubling vectors' peak;
    // the merge emit below streams old chars from the packed BWT
    { std::vector<u64>().swap(ridx.rows); }

    std::vector<u64> key((size_t)m + 1);
    {
        for (i64 j = 0; j < m; j++)
            key[j] = ((u64)block[j] << 34) | ((u64)r[j] << 1);
        int c0 = N > 0 ? ridx.at(primary > 0 ? 0 : 0) : 0;
        // T_old[0] = pred-char of old suffix at position 1 ... simpler:
        // T_old[0] is the first char of the old text = the char the
        // rank-`primary` suffix starts with; recover from L2: it is
        // the c with L2[c] < primary+?  — primary is the rank of
        // T_old$ among rows incl $ (row 0); suffixes starting with c
        // occupy rows [1 + L2[c], 1 + L2[c+1]).
        c0 = 0;
        for (int c = 0; c < 4; c++)
            if ((i64)L2[c] + 1 <= primary && primary < (i64)L2[c + 1] + 1)
                { c0 = c; break; }
        if (N == 0) c0 = 0;
        key[m] = ((u64)c0 << 34) | (((u64)primary << 1) | 1);
    }
    std::vector<u64> order((size_t)m + 1);
    for (i64 j = 0; j <= m; j++) order[j] = (key[j] << 28) | (u64)j;
    std::sort(order.begin(), order.end());

    // ranks after the first pass + tie-group doubling (Larsson-
    // Sadakane on the unresolved groups only; ties need identical
    // (char, rank) pairs, which the r-anchors make rare — the deep
    // case is a block boundary inside a long tandem repeat)
    std::vector<i64> rnk((size_t)m + 1);
    std::vector<std::pair<i64, i64>> groups;   // [start, end) in order[]
    {
        i64 i = 0;
        while (i <= m) {
            i64 jv = (i64)(order[i] & ((1u << 28) - 1));
            u64 kv = order[i] >> 28;
            i64 e = i + 1;
            while (e <= m && (order[e] >> 28) == kv) e++;
            for (i64 t = i; t < e; t++)
                rnk[(size_t)(order[t] & ((1u << 28) - 1))] = i;
            if (e - i > 1) groups.emplace_back(i, e);
            (void)jv;
            i = e;
        }
    }
    std::vector<u64> scratch;
    for (i64 h = 1; !groups.empty(); h <<= 1) {
        if (h > m + 1) { return -2; }          // cannot happen (unique K[m])
        // refine every group by rank[j + h] using the PRE-ROUND ranks
        std::vector<std::pair<i64, i64>> next_groups;
        std::vector<std::pair<i64, i64>> updates;  // (order-pos, new rank)
        for (auto [s, e] : groups) {
            scratch.clear();
            for (i64 t = s; t < e; t++) {
                i64 j = (i64)(order[t] & ((1u << 28) - 1));
                i64 j2 = j + h;
                i64 r2 = j2 <= m ? rnk[(size_t)j2] : -(m + 2 - j);
                scratch.push_back(((u64)(r2 + m + 2) << 28) | (u64)j);
            }
            std::sort(scratch.begin(), scratch.end());
            for (i64 t = s; t < e; t++)
                order[t] = (scratch[(size_t)(t - s)] & ((1u << 28) - 1));
            // record new rank assignments; apply after ALL groups so
            // every comparison this round uses pre-round ranks
            i64 i2 = s;
            while (i2 < e) {
                u64 kv = scratch[(size_t)(i2 - s)] >> 28;
                i64 e2 = i2 + 1;
                while (e2 < e && (scratch[(size_t)(e2 - s)] >> 28) == kv) e2++;
                for (i64 t = i2; t < e2; t++)
                    updates.emplace_back(t, i2);
                if (e2 - i2 > 1) next_groups.emplace_back(i2, e2);
                i2 = e2;
            }
        }
        for (auto [t, nr] : updates)
            rnk[(size_t)order[t]] = nr;
        groups.swap(next_groups);
        // restore packed form for untouched invariant (order[] in the
        // groups now holds bare j; rebuild key<<28 form lazily is not
        // needed — only bare j is used below)
    }
    // order[] entries inside former groups hold bare j, others hold
    // (key<<28)|j — normalize to bare j everywhere
    for (i64 t = 0; t <= m; t++) order[t] &= (1u << 28) - 1;

    // ---- merge interleave.  Old included rows = N+1 (N stored chars
    // + the $ slot at `primary`, which now carries the REAL char
    // B[m-1]: the old text's suffix 0 is now preceded by the block's
    // last char).  New rows = m, of which suffix 0's row is the new $
    // slot.  Total stored chars = (N+1) + (m-1) = N+m.
    i64 NT = N + m;
    i64 new_primary = -1;
    {
        std::vector<u64> real_order;           // new suffixes, ascending
        real_order.reserve((size_t)m);
        for (i64 t = 0; t <= m; t++)
            if (order[(size_t)t] != (u64)m)
                real_order.push_back(order[(size_t)t]);
        i64 old_row = 0;      // next old included row to emit [0, N]
        i64 old_stored = 0;   // old stored-char cursor
        i64 out_stored = 0;   // chars written
        i64 out_pos = 0;      // merged included row counter
        auto emit_old = [&]() {
            if (old_row == primary) {
                set_code(bwt_out, out_stored++, block[m - 1]);
            } else {
                set_code(bwt_out, out_stored++,
                         get_code(bwt_packed, old_stored));
                old_stored++;
            }
            old_row++;
            out_pos++;
        };
        for (i64 t = 0; t < m; t++) {
            i64 j = (i64)real_order[(size_t)t];
            while (old_row < r[(size_t)j]) emit_old();
            if (j == 0) new_primary = out_pos;  // new $ slot: no char
            else set_code(bwt_out, out_stored++, block[j - 1]);
            out_pos++;
        }
        while (old_row <= N) emit_old();
        if (new_primary < 0 || out_stored != NT || old_stored != N)
            return -3;
    }
    *primary_out = new_primary;
    return 0;
}

// Sampled suffix array from a finished BWT via the inverse-Psi walk —
// the reference's bwt_cal_sa (FM_index/bwt.c:62-84), which is also
// how bwaidx derives .sa.  sa_out has (N + intv) / intv entries;
// sa_out[0] is set to ~0 (bwt_cal_sa stores -1 there).
int cs_bwt_cal_sa(const u8* bwt_packed, i64 N, i64 primary,
                  int sa_intv, u64* sa_out) {
    if (N < 0 || primary < 0 || primary > N || sa_intv <= 0) return -1;
    RankIdx ridx;
    ridx.build(bwt_packed, N);
    u64 cnt[4];
    {
        const u64* last = &ridx.rows[(size_t)(((N + 255) >> 8)) * 12];
        for (int c = 0; c < 4; c++) cnt[c] = last[c];
    }
    u64 L2[5] = {0, 0, 0, 0, 0};
    for (int c = 0; c < 4; c++) L2[c + 1] = L2[c] + cnt[c];

    i64 isa = 0;
    i64 sa = N;
    for (i64 i = 0; i < N; i++) {
        if ((isa & (sa_intv - 1)) == 0) sa_out[isa / sa_intv] = (u64)sa;
        sa--;
        // inv_psi(isa) in the fm.py convention
        if (isa == primary) { isa = 0; continue; }
        i64 x = isa - (isa > primary);
        int c = ridx.at(x);
        isa = (i64)L2[c] + (i64)ridx.rank(c, x + 1);
    }
    if ((isa & (sa_intv - 1)) == 0) sa_out[isa / sa_intv] = (u64)sa;
    sa_out[0] = ~(u64)0;
    return 0;
}

}  // extern "C"
