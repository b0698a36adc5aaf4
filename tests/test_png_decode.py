"""Real-codec decode through the multimodal seam (round-9 verdict
item 4): png_decoder() decodes ACTUAL zlib-compressed PNG bytes —
every scanline filter, the five common color types — and
perceptual_hashes(decoder=png_decoder()) over real PNGs matches a
DuckDB oracle that recomputes dHash/aHash from the ground-truth
pixel matrices the test encoded. pil_decoder stays the production
path; this is the CI-able proof the seam's contract (payload ->
2-D grayscale) holds for real compressed input, not only the
deterministic stub."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from datasette_upload_csvs_spark.operators import multimodal


def _chunk(typ: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + typ
        + data
        + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
    )


def _row_bytes(row, depth):
    """Flatten one scanline of pixel values (ints or tuples) to raw
    bytes; 16-bit samples are big-endian sample pairs; sub-byte
    samples (depth 1/2/4, single-channel only) pack MSB-first with
    zero pad bits closing the final byte, per RFC 2083 §2.3."""
    if depth < 8:
        bits = []
        for p in row:
            v = p if not isinstance(p, (tuple, list)) else p[0]
            bits.extend((v >> (depth - 1 - i)) & 1 for i in range(depth))
        while len(bits) % 8:
            bits.append(0)
        return [
            sum(b << (7 - i) for i, b in enumerate(bits[o:o + 8]))
            for o in range(0, len(bits), 8)
        ]
    flat = []
    for p in row:
        for v in p if isinstance(p, (tuple, list)) else (p,):
            if depth == 16:
                flat.extend(((v >> 8) & 0xFF, v & 0xFF))
            else:
                flat.append(v & 0xFF)
    return flat


def _filter_scanlines(byte_rows, bpp, filters):
    """PNG-filter a (sub-)image's scanlines (already byte-flattened);
    `bpp` is the filter distance in bytes. prev starts at zero — each
    Adam7 pass filters independently, like a fresh image."""
    raw = bytearray()
    prev = [0] * (len(byte_rows[0]) if byte_rows else 0)
    for r, flat in enumerate(byte_rows):
        f = filters[r % len(filters)] if filters else 0
        if f == 0:
            enc = flat
        elif f == 1:
            enc = [
                (flat[i] - (flat[i - bpp] if i >= bpp else 0)) & 0xFF
                for i in range(len(flat))
            ]
        elif f == 2:
            enc = [(flat[i] - prev[i]) & 0xFF for i in range(len(flat))]
        elif f == 3:
            enc = [
                (
                    flat[i]
                    - (((flat[i - bpp] if i >= bpp else 0) + prev[i]) >> 1)
                )
                & 0xFF
                for i in range(len(flat))
            ]
        elif f == 4:
            enc = []
            for i in range(len(flat)):
                a = flat[i - bpp] if i >= bpp else 0
                b = prev[i]
                c = prev[i - bpp] if i >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                enc.append((flat[i] - pred) & 0xFF)
        else:  # pragma: no cover - encoder misuse
            raise ValueError(f)
        raw.append(f)
        raw.extend(enc)
        prev = flat
    return raw


def encode_png(rows, ctype=0, palette=None, filters=None, depth=8,
               interlace=0):
    """Minimal PNG encoder (test-side ground truth): `rows` is a
    list of scanlines, each a list of ints (gray/palette) or tuples
    (multi-channel); `filters[r]` picks the scanline filter so the
    decoder's unfilter paths are all exercised. depth=16 encodes
    big-endian sample pairs; interlace=1 emits the seven Adam7
    passes, each filtered as an independent sub-image."""
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[ctype]
    h, w = len(rows), len(rows[0])
    bpp = max(1, channels * (depth // 8))
    if interlace == 0:
        raw = _filter_scanlines(
            [_row_bytes(row, depth) for row in rows], bpp, filters
        )
    else:
        raw = bytearray()
        for x0, y0, dx, dy in multimodal._ADAM7:
            sub = [
                _row_bytes(
                    [rows[r][c] for c in range(x0, w, dx)], depth
                )
                for r in range(y0, h, dy)
            ]
            if not sub or not sub[0]:
                continue
            raw.extend(_filter_scanlines(sub, bpp, filters))
    ihdr = struct.pack(">IIBBBBB", w, h, depth, ctype, 0, 0, interlace)
    out = b"\x89PNG\r\n\x1a\n" + _chunk(b"IHDR", ihdr)
    if palette is not None:
        out += _chunk(b"PLTE", bytes(palette))
    return out + _chunk(b"IDAT", zlib.compress(bytes(raw))) + _chunk(
        b"IEND", b""
    )


def _gray_matrix(h, w, seed=0):
    return [
        [(r * 37 + c * 23 + 7 * seed) % 256 for c in range(w)]
        for r in range(h)
    ]


def test_gray_roundtrip_all_filters():
    px = _gray_matrix(10, 13)
    # rows cycle through every filter type
    png = encode_png(px, ctype=0, filters=[r % 5 for r in range(10)])
    got = multimodal.png_decoder()(png)
    assert got.dtype == np.uint8
    assert got.tolist() == px


def test_color_types_reduce_to_luma():
    dec = multimodal.png_decoder()
    rgb_rows = [
        [((r * 11 + c) % 256, (c * 17) % 256, (r * 29) % 256)
         for c in range(6)]
        for r in range(5)
    ]
    expect = [
        [(299 * p[0] + 587 * p[1] + 114 * p[2]) // 1000 for p in row]
        for row in rgb_rows
    ]
    # RGB, with Paeth on every row after the first
    png = encode_png(rgb_rows, ctype=2, filters=[0, 4, 4, 4, 4])
    assert dec(png).tolist() == expect
    # RGBA: alpha ignored
    rgba_rows = [
        [(p[0], p[1], p[2], 128) for p in row] for row in rgb_rows
    ]
    assert dec(encode_png(rgba_rows, ctype=6)).tolist() == expect
    # gray+alpha: luma is the gray channel
    ga_rows = [[(v, 77) for v in row] for row in _gray_matrix(4, 5)]
    assert dec(encode_png(ga_rows, ctype=4)).tolist() == _gray_matrix(4, 5)
    # palette: indices map through PLTE, then luma
    pal = []
    for i in range(4):
        pal.extend((i * 60, i * 30, i * 15))
    idx_rows = [[(r + c) % 4 for c in range(7)] for r in range(3)]
    expect_pal = [
        [
            (299 * (i * 60) + 587 * (i * 30) + 114 * (i * 15)) // 1000
            for i in row
        ]
        for row in idx_rows
    ]
    assert dec(
        encode_png(idx_rows, ctype=3, palette=pal)
    ).tolist() == expect_pal


def test_unsupported_profiles_raise():
    dec = multimodal.png_decoder()
    with pytest.raises(multimodal.DecoderUnavailable):
        dec(b"not a png at all")
    with pytest.raises(multimodal.DecoderUnavailable):
        # sub-byte depth is gray/palette-only: 4-bit RGB is illegal
        rgb = [[(1, 2, 3), (3, 2, 1)], [(0, 1, 2), (2, 1, 0)]]
        dec(encode_png(rgb, ctype=2, depth=4))
    with pytest.raises(multimodal.DecoderUnavailable):
        # 16-bit palette indices are not legal PNG
        pal = [0, 0, 0, 255, 255, 255]
        dec(encode_png([[0, 1], [1, 0]], ctype=3, palette=pal, depth=16))


def test_sub_byte_depths_decode():
    """Round-11 VERDICT item 7: 1/2/4-bit packed gray and palette
    images decode exactly — MSB-first bit order, pad bits at the row
    tail ignored, gray scaled by 255/(2^d−1), palette indices mapped
    through PLTE then luma — through every scanline filter and both
    interlace modes. Widths are chosen so rows do NOT end on byte
    boundaries (the pad-bit path)."""
    dec = multimodal.png_decoder()
    for depth in (1, 2, 4):
        top = (1 << depth) - 1
        scale = 255 // top
        # gray, width forcing pad bits (w*depth % 8 != 0)
        h, w = 7, 11
        px = [[(r * 5 + c * 3) % (top + 1) for c in range(w)]
              for r in range(h)]
        png = encode_png(px, ctype=0, depth=depth,
                         filters=[r % 5 for r in range(h)])
        assert dec(png).tolist() == [
            [v * scale for v in row] for row in px
        ], ("gray", depth)
        # same image Adam7-interlaced: per-pass strides are re-packed
        png_i = encode_png(px, ctype=0, depth=depth, interlace=1,
                           filters=[1, 2, 3, 4, 0])
        assert dec(png_i).tolist() == [
            [v * scale for v in row] for row in px
        ], ("gray-adam7", depth)
        # palette: indices are NOT scaled, they map through PLTE
        pal = []
        for i in range(top + 1):
            pal.extend(((i * 97) % 256, (i * 53) % 256, (i * 29) % 256))
        idx = [[(r + c) % (top + 1) for c in range(w)] for r in range(h)]
        expect = [
            [
                (
                    299 * ((i * 97) % 256)
                    + 587 * ((i * 53) % 256)
                    + 114 * ((i * 29) % 256)
                ) // 1000
                for i in row
            ]
            for row in idx
        ]
        png_p = encode_png(idx, ctype=3, palette=pal, depth=depth,
                           filters=[(r + 1) % 5 for r in range(h)])
        assert dec(png_p).tolist() == expect, ("palette", depth)


def test_16bit_depth_reduces_to_high_byte():
    """Round-10 VERDICT item 7: 16-bit PNGs decode (high-byte
    reduction — the standard 8-bit view), through every scanline
    filter; the filter distance is 2 bytes/sample, a path an 8-bit
    image never exercises."""
    dec = multimodal.png_decoder()
    h, w = 9, 11
    vals = [
        [((r * 4099 + c * 257 + 13) * 53) % 65536 for c in range(w)]
        for r in range(h)
    ]
    expect = [[v >> 8 for v in row] for row in vals]
    png = encode_png(vals, ctype=0, depth=16,
                     filters=[r % 5 for r in range(h)])
    assert dec(png).tolist() == expect
    # 16-bit RGB: luma of the high bytes
    rgb = [
        [((v * 7) % 65536, (v * 11) % 65536, (v * 13) % 65536)
         for v in row]
        for row in vals
    ]
    expect_rgb = [
        [
            (299 * (p[0] >> 8) + 587 * (p[1] >> 8) + 114 * (p[2] >> 8))
            // 1000
            for p in row
        ]
        for row in rgb
    ]
    png = encode_png(rgb, ctype=2, depth=16,
                     filters=[(r + 2) % 5 for r in range(h)])
    assert dec(png).tolist() == expect_rgb


def test_adam7_interlaced_roundtrip():
    """Round-10 VERDICT item 7: Adam7 images decode exactly — each of
    the 7 passes unfiltered as an independent sub-image and scattered
    to (y0 + r·dy, x0 + c·dx). Sizes below 8 leave some passes empty;
    both shapes are pinned."""
    dec = multimodal.png_decoder()
    for h, w in [(16, 16), (10, 13), (5, 3), (1, 1), (3, 9)]:
        px = _gray_matrix(h, w, seed=h * 31 + w)
        png = encode_png(px, ctype=0, interlace=1,
                         filters=[0, 1, 2, 3, 4])
        assert dec(png).tolist() == px, (h, w)
    # interlaced RGBA with filters: color + alpha + interlace together
    rgb_rows = [
        [((r * 19 + c * 5) % 256, (c * 31) % 256, (r * 43) % 256, 200)
         for c in range(12)]
        for r in range(9)
    ]
    expect = [
        [(299 * p[0] + 587 * p[1] + 114 * p[2]) // 1000 for p in row]
        for row in rgb_rows
    ]
    png = encode_png(rgb_rows, ctype=6, interlace=1, filters=[4, 2, 1])
    assert dec(png).tolist() == expect
    # interlaced 16-bit gray: both new profiles composed
    vals16 = [
        [((r * 521 + c * 77) * 129) % 65536 for c in range(10)]
        for r in range(11)
    ]
    png = encode_png(vals16, ctype=0, depth=16, interlace=1,
                     filters=[3, 4, 0])
    assert dec(png).tolist() == [[v >> 8 for v in r] for r in vals16]


def test_phash_over_real_png_matches_duckdb_oracle(spark):
    """End-to-end: Spark decodes REAL compressed PNG bytes through
    the seam and hashes the decoded pixels; DuckDB recomputes both
    hashes from the ground-truth 8x9 matrices the test encoded (the
    PNG round trip is pixel-identity, so oracle == pixel math while
    Spark goes through actual zlib/unfilter decode). 8x9 input makes
    the dHash downsample the identity and the aHash 8x8 pool merge
    exactly the last two columns — SQL-expressible without floats
    (doubled-value trick keeps the mean test integer-exact)."""
    import duckdb

    from datasette_upload_csvs_spark.queries import _DHASH_TERMS

    mats = {mid: _gray_matrix(8, 9, seed=mid) for mid in range(12)}
    rows = [
        (mid, bytearray(encode_png(m, filters=[r % 5 for r in range(8)])))
        for mid, m in mats.items()
    ]
    media = spark.createDataFrame(
        rows, "media_id long, payload binary"
    )
    got = {
        r["media_id"]: (r["dhash64"], r["ahash64"])
        for r in multimodal.perceptual_hashes(
            media, decoder=multimodal.png_decoder()
        ).collect()
    }

    # oracle: q2 doubles the pooled aHash values so the half-integer
    # means of the merged last columns stay exact: 64*q_i > sum(q)
    # <=> 64*q2_i > sum(q2)
    def q2(i):
        r, c = i // 8, i % 8
        if c < 7:
            return f"2 * p[{r * 9 + c + 1}]"
        return f"(p[{r * 9 + 8}] + p[{r * 9 + 9}])"

    ahash_terms = " + ".join(
        f"(CASE WHEN 64 * ({q2(i)}) > qs2 THEN {1 << i} ELSE 0 END)"
        for i in range(63)
    ) + f" + (CASE WHEN 64 * ({q2(63)}) > qs2 THEN {-(1 << 63)} ELSE 0 END)"
    qs2 = " + ".join(q2(i) for i in range(64))

    con = duckdb.connect()
    con.execute("CREATE TABLE t (media_id BIGINT, p BIGINT[])")
    for mid, m in mats.items():
        con.execute(
            "INSERT INTO t VALUES (?, ?)",
            [mid, [v for row in m for v in row]],
        )
    oracle = {
        mid: (dh, ah)
        for mid, dh, ah in con.execute(
            f"""
            SELECT media_id,
                   CAST({_DHASH_TERMS} AS BIGINT) AS dhash64,
                   CAST({ahash_terms} AS BIGINT) AS ahash64
            FROM (SELECT media_id, p, {qs2} AS qs2 FROM t)
            """
        ).fetchall()
    }
    assert got == oracle
    spark.catalog.clearCache()


# ---------------------------------------------------------------- property
try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    _HAVE_HYP = True
except ImportError:  # pragma: no cover
    _HAVE_HYP = False


if _HAVE_HYP:

    @settings(max_examples=40, deadline=None)
    @given(
        data=st.data(),
        h=st.integers(2, 12),
        w=st.integers(2, 12),
        ctype=st.sampled_from([0, 2, 6, 4]),
        depth=st.sampled_from([8, 16]),
        interlace=st.sampled_from([0, 1]),
    )
    def test_png_roundtrip_property(data, h, w, ctype, depth, interlace):
        """Any image of any small shape, any per-row filter sequence,
        any supported color type × depth × interlace combination:
        decode(encode(px)) is the exact (high-byte) luma of px."""
        channels = {0: 1, 2: 3, 4: 2, 6: 4}[ctype]
        top = 255 if depth == 8 else 65535
        rows = [
            [
                tuple(
                    data.draw(st.integers(0, top))
                    for _ in range(channels)
                )
                if channels > 1
                else data.draw(st.integers(0, top))
                for _ in range(w)
            ]
            for _ in range(h)
        ]
        filters = [data.draw(st.integers(0, 4)) for _ in range(h)]
        png = encode_png(rows, ctype=ctype, filters=filters,
                         depth=depth, interlace=interlace)
        got = multimodal.png_decoder()(png).tolist()
        shift = 0 if depth == 8 else 8

        def lum(p):
            if ctype == 0:
                return p >> shift
            if ctype == 4:
                return p[0] >> shift
            return (
                299 * (p[0] >> shift)
                + 587 * (p[1] >> shift)
                + 114 * (p[2] >> shift)
            ) // 1000

        assert got == [[lum(p) for p in r] for r in rows]

    @settings(max_examples=40, deadline=None)
    @given(
        data=st.data(),
        h=st.integers(1, 10),
        w=st.integers(1, 13),
        ctype=st.sampled_from([0, 3]),
        depth=st.sampled_from([1, 2, 4]),
        interlace=st.sampled_from([0, 1]),
    )
    def test_png_subbyte_roundtrip_property(
        data, h, w, ctype, depth, interlace
    ):
        """Sub-byte profile (round-11 VERDICT item 7): any small
        shape × any per-row filter sequence × depth ∈ {1,2,4} ×
        {gray, palette} × {sequential, Adam7} decodes to the exact
        scaled-gray / palette-luma matrix — including widths whose
        packed rows end mid-byte and Adam7 passes one sample wide."""
        top = (1 << depth) - 1
        rows = [
            [data.draw(st.integers(0, top)) for _ in range(w)]
            for _ in range(h)
        ]
        filters = [data.draw(st.integers(0, 4)) for _ in range(h)]
        if ctype == 3:
            pal = []
            for i in range(top + 1):
                pal.extend(
                    data.draw(st.integers(0, 255)) for _ in range(3)
                )
            png = encode_png(rows, ctype=3, palette=pal, depth=depth,
                             filters=filters, interlace=interlace)
            expect = [
                [
                    (
                        299 * pal[3 * i]
                        + 587 * pal[3 * i + 1]
                        + 114 * pal[3 * i + 2]
                    ) // 1000
                    for i in row
                ]
                for row in rows
            ]
        else:
            png = encode_png(rows, ctype=0, depth=depth,
                             filters=filters, interlace=interlace)
            scale = 255 // top
            expect = [[v * scale for v in row] for row in rows]
        assert multimodal.png_decoder()(png).tolist() == expect
