#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: compare graft.Verify
parquet dumps against DuckDB running the oracle SQL on the same tables.

Usage: python3 tools/oracle_check.py <verify_out_dir> <sf_dir>
"""
import json
import math
import sys
from pathlib import Path

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    if v is None:
        return "<NULL>"
    if isinstance(v, float):
        if math.isnan(v):
            return "<NULL>"
        return repr(v)
    if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
        return "[" + ",".join(norm_cell(x) for x in v) + "]"
    return str(v)


def canon(df: pd.DataFrame):
    cols = sorted(df.columns)
    rows = [tuple(norm_cell(v) for v in row)
            for row in df[cols].itertuples(index=False, name=None)]
    rows.sort()
    return cols, rows


def t20_oracle(con, sf_dir):
    """Deflate has no DuckDB SQL twin, so the t20 reference is computed
    here with Python zlib — the SAME stream (zlib wrapper, level 6) as the
    engine's java.util.zip.Deflater(6); byte-size parity between the two
    implementations is pinned by CompressRatioSpec and was re-verified
    empirically (identical sizes on repetitive/short/empty/long inputs)."""
    import zlib
    docs = con.execute(
        f"SELECT doc_id, text FROM '{sf_dir}/documents.parquet'").df()
    rows = []
    for doc_id, text in docs.itertuples(index=False, name=None):
        raw = text.encode("utf-8")
        comp = len(zlib.compress(raw, 6))
        # mirror the engine's math.rint(x*10000)/10000 (round-half-even)
        ratio = float(round(comp / max(len(raw), 1) * 10000)) / 10000
        rows.append((doc_id, len(raw), comp, ratio,
                     1 if ratio < 0.35 else 0))
    return pd.DataFrame(rows, columns=[
        "doc_id", "n_bytes", "n_compressed", "ratio", "repetitive"])


# ---- real-pixel image references (m2/m3/m6) --------------------------------
# The engine synthesizes real PNGs, decodes them with javax.imageio, and
# does integer pixel math; the reference here re-derives the SAME pixels
# through an independent pure-Python PNG cycle — encode the formula pixels
# as a filter-0 RGB8 PNG, zlib-inflate the IDAT back, parse scanlines —
# then runs identical integer resample/luma/dHash math. A defect in the
# engine's PNG encoder, ImageIO usage, resampler, or hash mismatches here.

def _px(id_, frame, x, y, w, h):
    r = x * 255 // (w - 1)
    b = y * 255 // (h - 1)
    # linear combine then square mod prime (matches the engine exactly;
    # an xor-separable hash would preserve orderings across ids)
    m = ((id_ + 1) * 1000003 + frame * 8191 + x * 131 + y) % 67867967
    g = (m * m % 16777213) % 256
    return (r, g, b)


def _png_cycle(w, h, px):
    """pixels -> filter-0 RGB8 PNG scanlines -> zlib deflate -> inflate ->
    unfilter: the decoded matrix the engine must also land on (PNG is
    lossless)."""
    import zlib
    raw = bytearray()
    for y in range(h):
        raw.append(0)
        for x in range(w):
            raw.extend(px(x, y))
    dec = zlib.decompress(zlib.compress(bytes(raw)))
    stride = 1 + 3 * w
    img = []
    for y in range(h):
        o = y * stride
        assert dec[o] == 0, "unexpected scanline filter"
        img.append([(dec[o + 1 + 3 * x], dec[o + 2 + 3 * x], dec[o + 3 + 3 * x])
                    for x in range(w)])
    return img


def _bilinear(src, tw, th):
    h, w = len(src), len(src[0])
    out = []
    for ti in range(th):
        y_f = ((2 * ti + 1) * h - th) * 128 // th
        y0, fy = y_f >> 8, y_f & 255
        y1 = min(y0 + 1, h - 1)
        row = []
        for tj in range(tw):
            x_f = ((2 * tj + 1) * w - tw) * 128 // tw
            x0, fx = x_f >> 8, x_f & 255
            x1 = min(x0 + 1, w - 1)
            row.append(((256 - fx) * (256 - fy) * src[y0][x0] +
                        fx * (256 - fy) * src[y0][x1] +
                        (256 - fx) * fy * src[y1][x0] +
                        fx * fy * src[y1][x1]) >> 16)
        out.append(row)
    return out


def _luma(p):
    return (p[0] * 299 + p[1] * 587 + p[2] * 114) // 1000


def _doc_ids(con, sf_dir):
    return [r[0] for r in con.execute(
        f"SELECT doc_id FROM '{sf_dir}/documents.parquet' ORDER BY doc_id"
    ).fetchall()]


def m3_oracle(con, sf_dir):
    import hashlib
    rows = []
    for id_ in _doc_ids(con, sf_dir):
        w, h = 16 + id_ % 17, 12 + id_ % 13
        img = _png_cycle(w, h, lambda x, y: _px(id_, 0, x, y, w, h))
        rs = [_bilinear([[p[c] for p in row] for row in img], 8, 8)
              for c in range(3)]
        data = bytes(rs[c][y][x] for y in range(8) for x in range(8)
                     for c in range(3))
        mean = sum(_luma((rs[0][y][x], rs[1][y][x], rs[2][y][x]))
                   for y in range(8) for x in range(8)) // 64
        rows.append((id_, w, h, hashlib.md5(data).hexdigest(), mean))
    return pd.DataFrame(rows, columns=[
        "doc_id", "w", "h", "resized_md5", "mean_luma"])


def m2_oracle(con, sf_dir):
    import hashlib
    rows = []
    for id_ in _doc_ids(con, sf_dir):
        for f in (0, 4):
            img = _png_cycle(16, 12, lambda x, y: _px(id_, f, x, y, 16, 12))
            lum = [[_luma(p) for p in row] for row in img]
            flat = bytes(v for row in lum for v in row)
            rows.append((id_, f, sum(sum(r) for r in lum) // (16 * 12),
                         hashlib.md5(flat).hexdigest()))
    return pd.DataFrame(rows, columns=[
        "doc_id", "frame_idx", "mean_luma", "luma_md5"])


def _dhash60(img):
    g = _bilinear([[_luma(p) for p in row] for row in img], 11, 6)
    sig = 0
    for y in range(6):
        for x in range(10):
            if g[y][x + 1] > g[y][x]:
                sig |= 1 << (y * 10 + x)
    return sig


def m6_oracle(con, sf_dir):
    sigs = {}
    for id_ in _doc_ids(con, sf_dir):
        def px(x, y, edit):
            r, g, b = _px(id_, 0, x, y, 32, 24)
            if edit and 12 <= x < 16 and 8 <= y < 12:
                b = min(255, b + 6)
            return (r, g, b)
        sigs[id_] = _dhash60(_png_cycle(32, 24, lambda x, y: px(x, y, False)))
        sigs[id_ + 400000] = _dhash60(
            _png_cycle(32, 24, lambda x, y: px(x, y, True)))
    buckets = {}
    for id_, s in sigs.items():
        for b in range(4):
            buckets.setdefault((b, (s >> (15 * b)) & 32767), []).append(id_)
    pairs = set()
    for ids in buckets.values():
        ids.sort()
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                pairs.add((ids[i], ids[j]))
    rows = []
    for a, b in sorted(pairs):
        ham = bin(sigs[a] ^ sigs[b]).count("1")
        if ham <= 3:
            rows.append((a, b, ham))
    return pd.DataFrame(rows, columns=["doc_a", "doc_b", "hamming"])


def m9_oracle(con, sf_dir):
    rows = []
    for id_ in _doc_ids(con, sf_dir):
        cut1, cut2 = 2 + id_ % 3, 5 + id_ % 2

        def scene(f):
            return 0 if f < cut1 else (1 if f < cut2 else 2)

        def frame_luma(f):
            def px(x, y):
                r, g, b = _px(id_, scene(f), x, y, 16, 12)
                if x == 0 and y == 0:
                    b = min(255, b + f % 2)
                return (r, g, b)
            img = _png_cycle(16, 12, px)
            return [[_luma(p) for p in row] for row in img]

        lum = [frame_luma(f) for f in range(8)]
        for f in range(1, 8):
            diff = sum(abs(lum[f][y][x] - lum[f - 1][y][x])
                       for y in range(12) for x in range(16))
            rows.append((id_, f, diff, 1 if diff >= 1000 else 0))
    return pd.DataFrame(rows, columns=[
        "doc_id", "frame_idx", "diff_sum", "is_cut"])


def m10_oracle(con, sf_dir):
    """Keyframe near-dup (m9 ∘ m6): per doc, the m9-style container's
    scene-first frames (texture seed doc_id >> 1 so twin docs share
    scenes; the f%2 corner jitter keeps twins near- not byte-equal),
    dHash-60 per keyframe, then the same 4x15-bit banding as m6."""
    sigs = {}
    for id_ in _doc_ids(con, sf_dir):
        cut1, cut2 = 2 + id_ % 3, 5 + id_ % 2

        def scene(f):
            return 0 if f < cut1 else (1 if f < cut2 else 2)

        tex = id_ >> 1
        for f, sc in ((0, 0), (cut1, 1), (cut2, 2)):
            def px(x, y):
                r, g, b = _px(tex, scene(f), x, y, 16, 12)
                if x == 0 and y == 0:
                    b = min(255, b + f % 2)
                return (r, g, b)
            sigs[id_ * 4 + sc] = _dhash60(_png_cycle(16, 12, px))
    buckets = {}
    for kf, s in sigs.items():
        for b in range(4):
            buckets.setdefault((b, (s >> (15 * b)) & 32767), []).append(kf)
    pairs = set()
    for ids in buckets.values():
        ids.sort()
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                pairs.add((ids[i], ids[j]))
    rows = []
    for a, b in sorted(pairs):
        ham = bin(sigs[a] ^ sigs[b]).count("1")
        if ham <= 3:
            rows.append((a // 4, a % 4, b // 4, b % 4, ham))
    return pd.DataFrame(rows, columns=[
        "doc_a", "scene_a", "doc_b", "scene_b", "hamming"])


def _tri(n, p):
    return abs((n % p) * 4000 // p - 2000) - 1000


def m8_oracle(con, sf_dir):
    """Audio reference: synthesize the same two-tone PCM, run it through
    an independent WAV encode + header-parse decode cycle, then the same
    integer DSP (peak, floor-sqrt RMS, zero crossings)."""
    import math
    import struct
    rows = []
    for id_ in _doc_ids(con, sf_dir):
        n = 800 + (id_ % 5) * 160
        p1, p2 = 20 + id_ % 11, 50 + id_ % 7
        samples = [_tri(i, p1) * 8 + _tri(i, p2) * 5 for i in range(n)]
        # WAV cycle: canonical RIFF encode, then re-parse header + LE int16
        data = b"".join(struct.pack("<h", s) for s in samples)
        wav = (b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE" +
               b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, 8000, 16000, 2, 16) +
               b"data" + struct.pack("<I", len(data)) + data)
        assert wav[:4] == b"RIFF" and wav[8:12] == b"WAVE"
        (sr,) = struct.unpack_from("<I", wav, 24)
        (dlen,) = struct.unpack_from("<I", wav, 40)
        dec = list(struct.unpack_from(f"<{dlen // 2}h", wav, 44))
        assert dec == samples
        peak = max(abs(v) for v in dec)
        rms = math.isqrt(sum(v * v for v in dec) // len(dec))
        zcr = sum(1 for i in range(1, len(dec))
                  if (dec[i] >= 0) != (dec[i - 1] >= 0))
        rows.append((id_, sr, len(dec), peak, rms, zcr))
    return pd.DataFrame(rows, columns=[
        "doc_id", "sample_rate", "n_samples", "peak", "rms", "zcr"])


def _mix64(x):
    m = (1 << 64) - 1
    x &= m
    x = ((x ^ (x >> 30)) * 0xBF58476D1CE4E5B9) & m
    x = ((x ^ (x >> 27)) * 0x94D049BB133111EB) & m
    return x ^ (x >> 31)


def m11_oracle(con, sf_dir):
    """Audio near-dup reference (m8 ∘ d11): the same two-tone PCM under the
    per-window power-of-2 amplitude melody, through an independent WAV
    encode + header-parse decode cycle (m8's discipline), then the
    windowed-|amplitude| 60-bit fingerprint and the 4x15-bit banding.
    Twins (docs 2j/2j+1, shared tex = id >> 1) differ in gain (x2) and
    phase (+3 samples) — byte-different WAVs, identical energy orderings."""
    import struct
    NW, WL = 120, 160

    def sig_for(doc):
        tex = doc >> 1
        gain, off = 1 + doc % 2, 3 * (doc % 2)
        p1, p2 = 20 + tex % 11, 50 + tex % 7
        samples = []
        prev = -1
        for w in range(NW):
            e = _mix64(tex * NW + w + 1) & 3
            if e == prev:
                e = (e + 1) % 4
            prev = e
            amp = 1 << e
            for i in range(WL):
                t = w * WL + i + off
                samples.append(gain * amp * (_tri(t, p1) + _tri(t, p2)))
        # WAV cycle: canonical RIFF encode, then re-parse header + LE int16
        data = b"".join(struct.pack("<h", s) for s in samples)
        wav = (b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE" +
               b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, 8000, 16000, 2, 16) +
               b"data" + struct.pack("<I", len(data)) + data)
        (dlen,) = struct.unpack_from("<I", wav, 40)
        dec = list(struct.unpack_from(f"<{dlen // 2}h", wav, 44))
        assert dec == samples
        f = [sum(abs(v) for v in dec[w * WL:(w + 1) * WL]) for w in range(NW)]
        sig = 0
        for i in range(60):
            if f[2 * i + 1] > f[2 * i]:
                sig |= 1 << i
        return sig

    sigs = {d: sig_for(d) for d in _doc_ids(con, sf_dir)}
    buckets = {}
    for d, s in sigs.items():
        for b in range(4):
            buckets.setdefault((b, (s >> (15 * b)) & 32767), []).append(d)
    pairs = set()
    for ids in buckets.values():
        ids.sort()
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                pairs.add((ids[i], ids[j]))
    rows = []
    for a, b in sorted(pairs):
        ham = bin(sigs[a] ^ sigs[b]).count("1")
        if ham <= 3:
            rows.append((a, b, ham))
    return pd.DataFrame(rows, columns=["doc_a", "doc_b", "hamming"])


# a5's golden contig set: the reference repo's bundled example reads
# (the only real dataset it ships) assemble to exactly ONE 4575 bp contig
# at k=31 minCov=2 — pinned by DomainRunSpec since round ~6 and by this
# digest (md5 of the orientation-canonicalized contig) since round 13.
# The fixture is SF-independent, so the expected table is constant.
A5_GOLDEN = [("66a1f0d81becb9f7e767bdb1f71e7f83", 4575)]


def a5_oracle(con, sf_dir):
    return pd.DataFrame(A5_GOLDEN, columns=["contig_md5", "len"])


# queries whose reference is not expressible in DuckDB SQL: computed in
# Python instead, hash-compared exactly like the SQL oracles
PY_ORACLES = {
    "t20_compress_ratio": t20_oracle,
    "m2_frame_sample": m2_oracle,
    "m3_resize": m3_oracle,
    "m6_phash_neardup": m6_oracle,
    "m8_audio_features": m8_oracle,
    "m9_scene_cuts": m9_oracle,
    "m10_keyframe_neardup": m10_oracle,
    "m11_audio_neardup": m11_oracle,
    "a5_example_assembly": a5_oracle,
}


def main():
    out_dir, sf_dir = Path(sys.argv[1]), sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if Path(p).exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracles = json.loads((out_dir / "oracle_sql.json").read_text())
    n_pass = n_fail = 0
    # non-SQL-expressible ops (PY_ORACLES) land in a SIBLING <out>_local
    # dir — Verify keeps them out of the driver-scanned tree, but the
    # local gate still hash-compares them against Python references
    local_dir = Path(str(out_dir).rstrip("/") + "_local")
    qdirs = sorted(p for p in out_dir.iterdir() if p.is_dir())
    if local_dir.is_dir():
        qdirs += sorted(p for p in local_dir.iterdir() if p.is_dir())
    for qdir in qdirs:
        name = qdir.name
        got = pd.read_parquet(qdir)
        if name not in oracles and name not in PY_ORACLES:
            print(f"{name}: NO-ORACLE rows={len(got)}")
            continue
        try:
            if name in PY_ORACLES:
                exp = PY_ORACLES[name](con, sf_dir)
            else:
                exp = con.execute(oracles[name]).df()
        except Exception as e:
            print(f"{name}: ORACLE-ERROR {e}")
            n_fail += 1
            continue
        gc, gr = canon(got)
        ec, er = canon(exp)
        if gc != ec:
            print(f"{name}: FAIL schema {gc} != {ec}")
            n_fail += 1
        elif gr != er:
            n_fail += 1
            diff = [(a, b) for a, b in zip(gr, er) if a != b][:3]
            extra_g = [r for r in gr if r not in set(er)][:3]
            extra_e = [r for r in er if r not in set(gr)][:3]
            print(f"{name}: FAIL rows got={len(gr)} exp={len(er)}")
            for a, b in diff:
                print(f"    got {a}\n    exp {b}")
            if extra_g:
                print(f"    only-in-got: {extra_g}")
            if extra_e:
                print(f"    only-in-exp: {extra_e}")
        else:
            n_pass += 1
            print(f"{name}: PASS rows={len(gr)}")
    print(f"== {n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
