#!/usr/bin/env python3
"""Independent reference for H.264 4x4 dequant + inverse transform (spec
8.5.12) and the Intra16x16 DC path (8.5.10) — written from the published
equations separately from the Scala decoder, so the mm9 oracle's residual
constants come from a second implementation rather than the code under
test (the mm1/mm7 "two stacks, one answer" policy).

Emits:
  1. the per-pattern 4x4 POST-ROUNDING residuals R[qp][pid][y][x] used by
     the mm9_h264_residual fixtures' I_4x4 macroblocks, after verifying
     the closed-form-prediction invariants the fixture design needs:
       - every row sum and column sum of R in [-2, 1]: one-neighbour DC
         prediction is (512 + s + 2) >> 2, both-neighbour
         (1024 + sL + sT + 4) >> 3 — both exactly 128 over that range,
         so every Intra_4x4 DC prediction in the single-MB frame is 128
       - |R| <= 100                                     (no pixel clipping)
  2. the I_16x16 flat-frame value c[qp][L] (DC-only Hadamard path).

Run: python3 tools/h264_residual_ref.py  -> prints SQL VALUES rows + a
Scala-readable summary. The constants are pasted into OracleSql's mm9
query; if the Scala decoder's math drifts from the spec, the oracle hash
breaks — that is the point.
"""

ZIGZAG = [0, 1, 4, 8, 5, 2, 3, 6, 9, 12, 13, 10, 7, 11, 14, 15]
VA = [10, 11, 13, 14, 16, 18]
VB = [16, 18, 20, 23, 25, 29]
VC = [13, 14, 16, 18, 20, 23]


def level_scale(m, raster):
    i, j = raster >> 2, raster & 3
    if i % 2 == 0 and j % 2 == 0:
        return VA[m]
    if i % 2 == 1 and j % 2 == 1:
        return VB[m]
    return VC[m]


def dequant(scan, qp):
    d = [0] * 16
    for k, c in enumerate(scan):
        if c:
            d[ZIGZAG[k]] = (c * level_scale(qp % 6, ZIGZAG[k])) << (qp // 6)
    return d


def idct(d):
    f = [0] * 16
    for i in range(4):
        o = 4 * i
        e0, e1 = d[o] + d[o + 2], d[o] - d[o + 2]
        e2, e3 = (d[o + 1] >> 1) - d[o + 3], d[o + 1] + (d[o + 3] >> 1)
        f[o], f[o + 1], f[o + 2], f[o + 3] = e0 + e3, e1 + e2, e1 - e2, e0 - e3
    r = [0] * 16
    for j in range(4):
        e0, e1 = f[j] + f[8 + j], f[j] - f[8 + j]
        e2, e3 = (f[4 + j] >> 1) - f[12 + j], f[4 + j] + (f[12 + j] >> 1)
        r[j] = (e0 + e3 + 32) >> 6
        r[4 + j] = (e1 + e2 + 32) >> 6
        r[8 + j] = (e1 - e2 + 32) >> 6
        r[12 + j] = (e0 - e3 + 32) >> 6
    return r


def inv_hadamard(c):
    f = [0] * 16
    for i in range(4):
        o = 4 * i
        z0, z1 = c[o] + c[o + 2], c[o] - c[o + 2]
        z2, z3 = c[o + 1] - c[o + 3], c[o + 1] + c[o + 3]
        f[o], f[o + 1], f[o + 2], f[o + 3] = z0 + z3, z1 + z2, z1 - z2, z0 - z3
    r = [0] * 16
    for j in range(4):
        z0, z1 = f[j] + f[8 + j], f[j] - f[8 + j]
        z2, z3 = f[4 + j] - f[12 + j], f[4 + j] + f[12 + j]
        r[j], r[4 + j], r[8 + j], r[12 + j] = z0 + z3, z1 + z2, z1 - z2, z0 - z3
    return r


def scale_dc16(f, qp):
    ls = level_scale(qp % 6, 0)
    if qp >= 36:
        return (f * ls) << (qp // 6 - 6)
    return (f * ls + (1 << (5 - qp // 6))) >> (6 - qp // 6)


# fixture contract — must match Multimodal.h264ResidualFromDocuments and
# the mm9 oracle SQL
QPS = [28, 31]
PATTERNS = {  # pid -> scan-order levels at scan indices (rest zero)
    0: {4: 2},
    1: {4: -2, 7: 1},
    2: {7: -3, 13: 1},
    3: {4: 4, 10: -2, 13: -1, 15: 1},
}
FLAT_LEVELS = [40, 80, 120, 160, 200]  # L = 40 * (1 + (m+k) % 5)


def pattern_residual(pid, qp):
    scan = [0] * 16
    for k, v in PATTERNS[pid].items():
        scan[k] = v
    return idct(dequant(scan, qp))


def flat_value(level, qp):
    # dc scan [L,0,...] -> Hadamard grid L at raster 0 -> f == L everywhere
    grid = [0] * 16
    grid[ZIGZAG[0]] = level
    f = inv_hadamard(grid)
    assert all(v == level for v in f)
    dc = scale_dc16(level, qp)
    d = [0] * 16
    d[0] = dc
    r = idct(d)
    assert len(set(r)) == 1
    return r[0]


# ---- chroma (round 15): 2x2 DC butterfly + 2003-spec chroma DC dequant
# ((f * LevelScale(qPc%6,0,0)) << (qPc/6)) >> 5, QPc per Table 8-15,
# chroma_qp_index_offset 0 (the writer twin's PPS), then the shared 4x4
# AC dequant/IDCT with the DC substituted at raster 0.

QPC_TABLE = {30: 29, 31: 30, 32: 31, 33: 32, 34: 32, 35: 33, 36: 34,
             37: 34, 38: 35, 39: 35, 40: 36, 41: 36, 42: 37, 43: 37,
             44: 37, 45: 38, 46: 38, 47: 38, 48: 39, 49: 39, 50: 39,
             51: 39}


def qpc(qp):
    return QPC_TABLE.get(qp, qp) if qp >= 30 else qp


def chroma_dc(scan4, qp_chroma):
    # scan order == 2x2 raster for 4:2:0: c00 c01 c10 c11
    c00, c01, c10, c11 = scan4
    f = [c00 + c01 + c10 + c11, c00 - c01 + c10 - c11,
         c00 + c01 - c10 - c11, c00 - c01 - c10 + c11]
    ls = VA[qp_chroma % 6]
    return [(v * ls << (qp_chroma // 6)) >> 5 for v in f]


def chroma_block(dc, ac15, qp_chroma):
    """4x4 chroma residual: AC levels (15 scan positions, zigzag 1..15)
    dequantized at qPc, DC substituted at raster 0, shared IDCT."""
    d = [0] * 16
    for k, c in enumerate(ac15):
        if c:
            raster = ZIGZAG[k + 1]
            d[raster] = (c * level_scale(qp_chroma % 6, raster)) << (qp_chroma // 6)
    d[0] = dc
    return idct(d)


# fixture contract — must match Multimodal.residualAu (round 15 chroma)
CHROMA_DC_I4 = [[8, 0, 0, 0], [-8, 4, 0, 0]]   # Cb, Cr scan levels
CHROMA_DC_I16 = [[5, 0, 0, 0], [-5, 0, 0, 0]]


def chroma_ac_i4(comp, blk):
    a = [0] * 15
    a[0] = 2 + comp + blk          # raster 1
    a[2] = -(1 + (comp + blk) % 2)  # raster 8
    return a


def main():
    print("-- mm9 I_4x4 residual constants: (qp, pid, py, px, r)")
    rows = []
    for qp in QPS:
        for pid in sorted(PATTERNS):
            r = pattern_residual(pid, qp)
            # invariants the closed-form oracle depends on
            for y in range(4):
                s = sum(r[4 * y + x] for x in range(4))
                assert -2 <= s <= 1, (qp, pid, "row", y, s)
            for x in range(4):
                s = sum(r[4 * y + x] for y in range(4))
                assert -2 <= s <= 1, (qp, pid, "col", x, s)
            assert all(abs(v) <= 100 for v in r), (qp, pid, r)
            for y in range(4):
                for x in range(4):
                    rows.append((qp, pid, y, x, r[4 * y + x]))
    print(",\n".join(
        "           (%d, %d, %d, %d, %d)" % t for t in rows))
    print("-- mm9 I_16x16 flat values: (qp, level, v)")
    flat = [(qp, lv, flat_value(lv, qp)) for qp in QPS for lv in FLAT_LEVELS]
    print(",\n".join("           (%d, %d, %d)" % t for t in flat))

    # chroma, I_4x4 frames WITHOUT AC (odd (id+k) == qp 31; DC-only blocks
    # are position-constant) — and the qp-28 no-AC case never occurs in the
    # fixture (AC rides even (id+k) == qp 28), but emit both qps anyway so
    # the fixture parity can change without regenerating.
    print("-- mm9 I_4x4 chroma DC-only residuals: (qp, comp, blk, r)")
    cdc = []
    for qp in QPS:
        q = qpc(qp)
        for comp in range(2):
            dcs = chroma_dc(CHROMA_DC_I4[comp], q)
            for blk in range(4):
                r = chroma_block(dcs[blk], [0] * 15, q)
                assert len(set(r)) == 1, (qp, comp, blk, r)
                cdc.append((qp, comp, blk, r[0]))
    print(",\n".join("           (%d, %d, %d, %d)" % t for t in cdc))
    # chroma, I_4x4 frames WITH AC (qp 28 only): full per-position residual
    # (DC contribution included)
    print("-- mm9 I_4x4 chroma AC residuals at qp 28: (comp, blk, cy, cx, r)")
    crows = []
    q = qpc(28)
    for comp in range(2):
        dcs = chroma_dc(CHROMA_DC_I4[comp], q)
        for blk in range(4):
            r = chroma_block(dcs[blk], chroma_ac_i4(comp, blk), q)
            assert all(-128 <= 128 + v <= 255 for v in r), (comp, blk, r)
            for cy in range(4):
                for cx in range(4):
                    crows.append((comp, blk, cy, cx, r[4 * cy + cx]))
    print(",\n".join("           (%d, %d, %d, %d, %d)" % t for t in crows))
    print("-- mm9 I_16x16 chroma flat DC residuals: (qp, comp, blk, r) " +
          "(constant over the 4x4 block)")
    c16 = []
    for qp in QPS:
        q = qpc(qp)
        for comp in range(2):
            dcs = chroma_dc(CHROMA_DC_I16[comp], q)
            for blk in range(4):
                r = chroma_block(dcs[blk], [0] * 15, q)
                assert len(set(r)) == 1, (qp, comp, blk, r)
                c16.append((qp, comp, blk, r[0]))
    print(",\n".join("           (%d, %d, %d, %d)" % t for t in c16))


if __name__ == "__main__":
    main()
