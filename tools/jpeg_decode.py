#!/usr/bin/env python3
"""Independent baseline-JPEG decoder — provenance for the committed
m7 golden table (fixtures/golden/m7_expected.parquet).

The judged m7 query decodes the committed .jpg fixtures through the
JDK's ImageIO codec (a libjpeg-6b derivative). To graduate m7 from
rows-only to the rows+schema+hash oracle gate, the expected outputs
are minted HERE, by a from-scratch Python implementation of the same
*published* algorithms (libjpeg 6b: jdhuff baseline Huffman decode,
jidctint's islow integer IDCT, jdsample's h2v2 fancy upsampling,
jdcolor's table-based integer YCbCr->RGB), and committed as a golden
parquet the oracle reads back verbatim. Two fully independent
decoders agreeing field-by-field on per-channel pixel SUMS is a far
stronger certificate than either alone; if a JDK upgrade ever
changes ImageIO's decode, the gate goes loudly red instead of
silently re-baselining.

Mirrors jpegSums' integrity gate: a stream not ending in EOI (FF D9)
is dropped row-wise (ImageIO would gray-fill missing MCUs, which is
decoder-implementation-defined fill, not content).

Usage: python3 tools/jpeg_decode.py [--write]
  default: decode + print + compare against the golden parquet if it
           exists (exit 1 on any mismatch)
  --write: (re)mint fixtures/golden/m7_expected.parquet
"""
import os
import struct
import sys

MEDIA = "/root/repo/fixtures/media"
GOLDEN = "/root/repo/fixtures/golden/m7_expected.parquet"


# ---------------------------------------------------------------- tables
def _post_idct_range_table():
    # jdmaster.c prepare_range_limit_table, viewed from
    # IDCT_range_limit (= sample_range_limit + CENTERJSAMPLE): the
    # &1023-masked post-IDCT index performs the +128 level shift and
    # the clamp in one lookup.
    t = [0] * 1024
    for j in range(1024):
        if j < 128:
            t[j] = j + 128
        elif j < 512:
            t[j] = 255
        elif j < 896:
            t[j] = 0
        else:
            t[j] = j - 896
    return t


RANGE = _post_idct_range_table()


def clamp8(x):
    return 0 if x < 0 else (255 if x > 255 else x)


# jdcolor.c build_ycc_rgb_table constants: FIX(x) = round(x * 65536)
_F140200, _F177200, _F071414, _F034414 = 91881, 116130, 46802, 22554
_ONE_HALF = 1 << 15
CR_R = [(_F140200 * (i - 128) + _ONE_HALF) >> 16 for i in range(256)]
CB_B = [(_F177200 * (i - 128) + _ONE_HALF) >> 16 for i in range(256)]
CR_G = [(-_F071414) * (i - 128) for i in range(256)]
CB_G = [(-_F034414) * (i - 128) + _ONE_HALF for i in range(256)]

ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63]


# ------------------------------------------------------------- bitreader
class BitReader:
    """jdhuff-style entropy reader: FF00 byte stuffing unstuffed, a
    marker mid-scan ends the stream (we only decode complete scans)."""

    def __init__(self, data, pos):
        self.d = data
        self.p = pos
        self.acc = 0
        self.n = 0

    def bit(self):
        if self.n == 0:
            b = self.d[self.p]
            self.p += 1
            if b == 0xFF:
                nxt = self.d[self.p]
                if nxt == 0x00:
                    self.p += 1
                else:
                    raise EOFError("marker in scan")
            self.acc = b
            self.n = 8
        self.n -= 1
        return (self.acc >> self.n) & 1

    def bits(self, k):
        v = 0
        for _ in range(k):
            v = (v << 1) | self.bit()
        return v


def build_huff(bits_counts, symbols):
    # Canonical code assignment (jdhuff jpeg_make_d_derived_tbl):
    # (length, code) -> symbol
    table = {}
    code = 0
    k = 0
    for ln in range(1, 17):
        for _ in range(bits_counts[ln - 1]):
            table[(ln, code)] = symbols[k]
            code += 1
            k += 1
        code <<= 1
    return table


def huff_decode(br, table):
    code = 0
    for ln in range(1, 17):
        code = (code << 1) | br.bit()
        if (ln, code) in table:
            return table[(ln, code)]
    raise ValueError("bad Huffman code")


def extend(v, t):
    # jdhuff HUFF_EXTEND
    return v if t == 0 or v >= (1 << (t - 1)) else v - (1 << t) + 1


# ------------------------------------------------------------ islow IDCT
# jidctint.c constants (CONST_BITS=13, PASS1_BITS=2)
_C = dict(
    F0298=2446, F0390=3196, F0541=4433, F0765=6270, F0899=7373,
    F1175=9633, F1501=12299, F1847=15137, F1961=16069, F2053=16819,
    F2562=20995, F3072=25172)
CONST_BITS, PASS1_BITS = 13, 2


def _descale(x, n):
    return (x + (1 << (n - 1))) >> n


def idct_islow(coef, qt):
    """coef: 64 natural-order dequantized-INPUT coefficients (we pass
    raw and multiply by qt here, like jddctmgr's ISLOW multiplier)."""
    ws = [0] * 64
    # column pass
    for c in range(8):
        col = [coef[r * 8 + c] * qt[r * 8 + c] for r in range(8)]
        if not any(col[1:]):
            dc = col[0] << PASS1_BITS
            for r in range(8):
                ws[r * 8 + c] = dc
            continue
        z2, z3 = col[2], col[6]
        z1 = (z2 + z3) * _C['F0541']
        tmp2 = z1 + z3 * (-_C['F1847'])
        tmp3 = z1 + z2 * _C['F0765']
        z2, z3 = col[0], col[4]
        tmp0 = (z2 + z3) << CONST_BITS
        tmp1 = (z2 - z3) << CONST_BITS
        t10, t13 = tmp0 + tmp3, tmp0 - tmp3
        t11, t12 = tmp1 + tmp2, tmp1 - tmp2
        tmp0, tmp1, tmp2, tmp3 = col[7], col[5], col[3], col[1]
        z1, z2 = tmp0 + tmp3, tmp1 + tmp2
        z3, z4 = tmp0 + tmp2, tmp1 + tmp3
        z5 = (z3 + z4) * _C['F1175']
        tmp0 *= _C['F0298']
        tmp1 *= _C['F2053']
        tmp2 *= _C['F3072']
        tmp3 *= _C['F1501']
        z1 *= -_C['F0899']
        z2 *= -_C['F2562']
        z3 = z3 * (-_C['F1961']) + z5
        z4 = z4 * (-_C['F0390']) + z5
        tmp0 += z1 + z3
        tmp1 += z2 + z4
        tmp2 += z2 + z3
        tmp3 += z1 + z4
        ws[8 * 0 + c] = _descale(t10 + tmp3, CONST_BITS - PASS1_BITS)
        ws[8 * 7 + c] = _descale(t10 - tmp3, CONST_BITS - PASS1_BITS)
        ws[8 * 1 + c] = _descale(t11 + tmp2, CONST_BITS - PASS1_BITS)
        ws[8 * 6 + c] = _descale(t11 - tmp2, CONST_BITS - PASS1_BITS)
        ws[8 * 2 + c] = _descale(t12 + tmp1, CONST_BITS - PASS1_BITS)
        ws[8 * 5 + c] = _descale(t12 - tmp1, CONST_BITS - PASS1_BITS)
        ws[8 * 3 + c] = _descale(t13 + tmp0, CONST_BITS - PASS1_BITS)
        ws[8 * 4 + c] = _descale(t13 - tmp0, CONST_BITS - PASS1_BITS)
    # row pass
    out = [0] * 64
    for r in range(8):
        row = ws[r * 8:r * 8 + 8]
        if not any(row[1:]):
            dc = RANGE[_descale(row[0], PASS1_BITS + 3) & 1023]
            for c in range(8):
                out[r * 8 + c] = dc
            continue
        z2, z3 = row[2], row[6]
        z1 = (z2 + z3) * _C['F0541']
        tmp2 = z1 + z3 * (-_C['F1847'])
        tmp3 = z1 + z2 * _C['F0765']
        tmp0 = (row[0] + row[4]) << CONST_BITS
        tmp1 = (row[0] - row[4]) << CONST_BITS
        t10, t13 = tmp0 + tmp3, tmp0 - tmp3
        t11, t12 = tmp1 + tmp2, tmp1 - tmp2
        tmp0, tmp1, tmp2, tmp3 = row[7], row[5], row[3], row[1]
        z1, z2 = tmp0 + tmp3, tmp1 + tmp2
        z3, z4 = tmp0 + tmp2, tmp1 + tmp3
        z5 = (z3 + z4) * _C['F1175']
        tmp0 *= _C['F0298']
        tmp1 *= _C['F2053']
        tmp2 *= _C['F3072']
        tmp3 *= _C['F1501']
        z1 *= -_C['F0899']
        z2 *= -_C['F2562']
        z3 = z3 * (-_C['F1961']) + z5
        z4 = z4 * (-_C['F0390']) + z5
        tmp0 += z1 + z3
        tmp1 += z2 + z4
        tmp2 += z2 + z3
        tmp3 += z1 + z4
        sh = CONST_BITS + PASS1_BITS + 3
        out[r * 8 + 0] = RANGE[_descale(t10 + tmp3, sh) & 1023]
        out[r * 8 + 7] = RANGE[_descale(t10 - tmp3, sh) & 1023]
        out[r * 8 + 1] = RANGE[_descale(t11 + tmp2, sh) & 1023]
        out[r * 8 + 6] = RANGE[_descale(t11 - tmp2, sh) & 1023]
        out[r * 8 + 2] = RANGE[_descale(t12 + tmp1, sh) & 1023]
        out[r * 8 + 5] = RANGE[_descale(t12 - tmp1, sh) & 1023]
        out[r * 8 + 3] = RANGE[_descale(t13 + tmp0, sh) & 1023]
        out[r * 8 + 4] = RANGE[_descale(t13 - tmp0, sh) & 1023]
    return out


# --------------------------------------------------------------- decoder
def decode_baseline(data):
    """Full baseline decode -> (width, height, [R plane, G, B]) of
    row-major 8-bit samples, or None for unsupported streams."""
    qt = {}
    dc_tabs, ac_tabs = {}, {}
    comps = None
    w = h = 0
    i = 2
    while True:
        if data[i] != 0xFF:
            raise ValueError("marker sync lost")
        m = data[i + 1]
        if m == 0xD8:
            i += 2
            continue
        L = struct.unpack('>H', data[i + 2:i + 4])[0]
        seg = data[i + 4:i + 2 + L]
        if m == 0xDB:
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 15
                p += 1
                if pq != 0:
                    return None  # 16-bit tables: not baseline-common
                nat = [0] * 64
                for k in range(64):
                    nat[ZIGZAG[k]] = seg[p + k]
                qt[tq] = nat
                p += 64
        elif m == 0xC4:
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 15
                counts = list(seg[p + 1:p + 17])
                n = sum(counts)
                syms = list(seg[p + 17:p + 17 + n])
                tab = build_huff(counts, syms)
                (dc_tabs if tc == 0 else ac_tabs)[th] = tab
                p += 17 + n
        elif m == 0xC0:
            h = struct.unpack('>H', seg[1:3])[0]
            w = struct.unpack('>H', seg[3:5])[0]
            nc = seg[5]
            comps = []
            for c in range(nc):
                cid = seg[6 + 3 * c]
                hs, vs = seg[7 + 3 * c] >> 4, seg[7 + 3 * c] & 15
                comps.append(dict(id=cid, hs=hs, vs=vs, tq=seg[8 + 3 * c]))
        elif m in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                   0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            return None  # only SOF0 baseline
        elif m == 0xDD:
            return None  # restart intervals unused by the fixtures
        elif m == 0xDA:
            ns = seg[0]
            scan = []
            for c in range(ns):
                cs = seg[1 + 2 * c]
                td, ta = seg[2 + 2 * c] >> 4, seg[2 + 2 * c] & 15
                comp = next(x for x in comps if x['id'] == cs)
                scan.append((comp, dc_tabs[td], ac_tabs[ta]))
            entropy_at = i + 2 + L
            return _decode_scan(data, entropy_at, w, h, comps, scan, qt)
        i += 2 + L


def _decode_scan(data, pos, w, h, comps, scan, qt):
    hmax = max(c['hs'] for c in comps)
    vmax = max(c['vs'] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    for c in comps:
        c['bw'] = mcux * c['hs']   # block cols on the padded surface
        c['bh'] = mcuy * c['vs']
        c['plane'] = [[0] * (c['bw'] * 8) for _ in range(c['bh'] * 8)]
        c['pred'] = 0
        # true downsampled dims (jpeg_decompress downsampled_width):
        # ceil(full_dim * sampling / max_sampling)
        c['dw'] = -(-w * c['hs'] // hmax)
        c['dh'] = -(-h * c['vs'] // vmax)
    br = BitReader(data, pos)
    for my in range(mcuy):
        for mx in range(mcux):
            for comp, dct, act in scan:
                for by in range(comp['vs']):
                    for bx in range(comp['hs']):
                        coef = [0] * 64
                        t = huff_decode(br, dct)
                        diff = extend(br.bits(t), t) if t else 0
                        comp['pred'] += diff
                        coef[0] = comp['pred']
                        k = 1
                        while k < 64:
                            rs = huff_decode(br, act)
                            r, s = rs >> 4, rs & 15
                            if s == 0:
                                if r != 15:
                                    break  # EOB
                                k += 16
                                continue
                            k += r
                            coef[ZIGZAG[k]] = extend(br.bits(s), s)
                            k += 1
                        px = idct_islow(coef, qt[comp['tq']])
                        bcol = mx * comp['hs'] + bx
                        brow = my * comp['vs'] + by
                        pl = comp['plane']
                        for r in range(8):
                            row = pl[brow * 8 + r]
                            row[bcol * 8:bcol * 8 + 8] = \
                                px[r * 8:r * 8 + 8]
    # upsample each component to full resolution, then color-convert
    ups = []
    for c in comps:
        if c['hs'] == hmax and c['vs'] == vmax:
            ups.append([row[:w] for row in c['plane'][:h]])
        elif 2 * c['hs'] == hmax and 2 * c['vs'] == vmax:
            ups.append(_h2v2_fancy(c['plane'], c['dw'], c['dh'], w, h))
        else:
            return None
    y_p, cb_p, cr_p = ups
    rp = [[0] * w for _ in range(h)]
    gp = [[0] * w for _ in range(h)]
    bp = [[0] * w for _ in range(h)]
    for yy in range(h):
        for xx in range(w):
            y = y_p[yy][xx]
            cb = cb_p[yy][xx]
            cr = cr_p[yy][xx]
            rp[yy][xx] = clamp8(y + CR_R[cr])
            gp[yy][xx] = clamp8(y + ((CB_G[cb] + CR_G[cr]) >> 16))
            bp[yy][xx] = clamp8(y + CB_B[cb])
    return w, h, (rp, gp, bp)


def _h2v2_fancy(plane, dw, dh, w, h):
    """jdsample h2v2_fancy_upsample: triangular filter, 3/4 nearer +
    1/4 farther in both directions; image edges duplicate the edge
    row/column. Input is the dw x dh downsampled grid."""
    out = [[0] * w for _ in range(h)]
    for orow in range(h):
        ir = orow >> 1
        # nearer = ir; farther = row above for even orow, below for odd
        far = ir - 1 if orow % 2 == 0 else ir + 1
        if far < 0:
            far = 0
        if far > dh - 1:
            far = dh - 1
        r0, r1 = plane[ir], plane[far]
        colsum = [r0[x] * 3 + r1[x] for x in range(dw)]
        orow_out = out[orow]
        for ox in range(w):
            ic = ox >> 1
            this = colsum[ic]
            if ox % 2 == 0:  # nearer on the left
                last = colsum[ic - 1] if ic > 0 else this
                v = (this * 3 + last + 8) >> 4
            else:
                nxt = colsum[ic + 1] if ic < dw - 1 else this
                v = (this * 3 + nxt + 7) >> 4
            orow_out[ox] = v
    return out


# ------------------------------------------------------------------ main
def jpeg_sums(path):
    b = open(path, 'rb').read()
    if len(b) < 4 or b[-2] != 0xFF or b[-1] != 0xD9:
        return None  # jpegSums' EOI integrity gate
    try:
        dec = decode_baseline(b)
    except Exception:
        return None
    if dec is None:
        return None
    w, h, (rp, gp, bp) = dec
    return (os.path.basename(path), w, h, 3,
            sum(map(sum, rp)), sum(map(sum, gp)), sum(map(sum, bp)))


def main():
    rows = []
    for name in sorted(os.listdir(MEDIA)):
        if not name.endswith('.jpg'):
            continue
        r = jpeg_sums(os.path.join(MEDIA, name))
        if r is not None:
            rows.append(r)
        else:
            print(f"drop {name} (integrity gate / unsupported)")
    for r in rows:
        print(r)
    if '--write' in sys.argv:
        import pyarrow as pa
        import pyarrow.parquet as pq
        os.makedirs(os.path.dirname(GOLDEN), exist_ok=True)
        cols = list(zip(*rows))
        t = pa.table({
            'file_name': pa.array(cols[0], pa.string()),
            'width': pa.array(cols[1], pa.int32()),
            'height': pa.array(cols[2], pa.int32()),
            'n_bands': pa.array(cols[3], pa.int32()),
            'sum_r': pa.array(cols[4], pa.int64()),
            'sum_g': pa.array(cols[5], pa.int64()),
            'sum_b': pa.array(cols[6], pa.int64())})
        pq.write_table(t, GOLDEN)
        print(f"wrote {GOLDEN}")
    elif os.path.exists(GOLDEN):
        import duckdb
        gold = duckdb.sql(
            f"SELECT * FROM read_parquet('{GOLDEN}') ORDER BY file_name"
        ).fetchall()
        mine = sorted(rows)
        ok = [tuple(g) for g in gold] == mine
        print("golden match:", ok)
        sys.exit(0 if ok else 1)


if __name__ == '__main__':
    main()
