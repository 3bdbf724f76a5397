"""Codec round-trips + fixture determinism (no Spark)."""

import numpy as np

from gdal_spark.codecs import png as PNG
from gdal_spark.codecs.fakelossy import decode_fake_lossy, encode_fake_lossy
from gdal_spark.codecs.registry import decode, encode
from gdal_spark.fixtures.images import (
    FMT_CYCLE,
    encode_row,
    generate_images_pdf,
    make_pixels,
    row_meta,
)
from gdal_spark.fixtures.points import caption_points_pdf
from gdal_spark.fixtures.tile_grid import parse_wkb_polygon, tile_grid_pdf
from gdal_spark.oracle.resample import psnr


class TestPNG:
    def test_roundtrip_gray(self):
        a = ((np.arange(300) * 7) % 256).astype(np.uint8).reshape(20, 15)
        assert np.array_equal(PNG.decode_png(PNG.encode_png(a)), a)

    def test_roundtrip_rgb(self):
        a = make_pixels(37, 23)
        assert np.array_equal(PNG.decode_png(PNG.encode_png(a)), a)

    def test_signature(self):
        data = PNG.encode_png(np.zeros((4, 4), dtype=np.uint8))
        assert data[:8] == b"\x89PNG\r\n\x1a\n"

    def test_filters_decode(self):
        # craft a 2-line image with filter 2 (Up) on second line
        import struct
        import zlib

        line0 = bytes([0]) + bytes([10, 20, 30])
        line1 = bytes([2]) + bytes([1, 1, 1])  # up-filtered: +prev line
        ihdr = struct.pack(">IIBBBBB", 3, 2, 8, 0, 0, 0, 0)
        raw = zlib.compress(line0 + line1)
        data = (
            b"\x89PNG\r\n\x1a\n"
            + PNG._chunk(b"IHDR", ihdr)
            + PNG._chunk(b"IDAT", raw)
            + PNG._chunk(b"IEND", b"")
        )
        out = PNG.decode_png(data)
        assert out.tolist() == [[10, 20, 30], [11, 21, 31]]


class TestFakeLossy:
    def test_roundtrip_stable(self):
        a = make_pixels(64, 64)
        enc = encode_fake_lossy(a, "jpeg")
        dec = decode_fake_lossy(enc)
        # idempotent: re-encoding the decoded image changes nothing
        assert np.array_equal(decode_fake_lossy(encode_fake_lossy(dec, "jpeg")), dec)

    def test_psnr_gate(self):
        a = make_pixels(128, 128)
        for fmt in ("jpeg", "webp"):
            dec = decode_fake_lossy(encode_fake_lossy(a, fmt))
            assert psnr(a, dec) >= 40.0, fmt

    def test_registry_dispatch(self):
        a = make_pixels(16, 16)
        for fmt in FMT_CYCLE:
            dec = decode(encode(a, fmt), fmt)
            assert dec.shape == a.shape
            if fmt == "png":
                assert np.array_equal(dec, a)


class TestFixtures:
    def test_deterministic(self):
        a = generate_images_pdf(20)
        b = generate_images_pdf(20)
        assert a.equals(b)
        # order-independence: generating rows 10..20 directly matches the slice
        c = generate_images_pdf(10, start=10).reset_index(drop=True)
        sl = a.iloc[10:20].reset_index(drop=True)
        assert c.equals(sl)

    def test_schema(self):
        df = generate_images_pdf(5)
        assert list(df.columns) == [
            "image_id", "bytes", "w", "h", "fmt", "caption", "phash",
            "lon", "lat", "gsd_m",
        ]
        assert df["image_id"][0] == "img00000000"

    def test_skew_cluster(self):
        meta = row_meta(np.arange(1000))
        hot = np.abs(meta["lon"] - 2.3) <= 0.5
        hot &= np.abs(meta["lat"] - 48.8) <= 0.5
        assert 0.18 <= hot.mean() <= 0.25  # ~20% skew cluster

    def test_bytes_decode(self):
        df = generate_images_pdf(6)
        for _, r in df.iterrows():
            arr = decode(r["bytes"], r["fmt"])
            assert arr.shape == (r["h"], r["w"], 3)
            exp = make_pixels(r["w"], r["h"])
            assert psnr(exp, arr) >= 40.0
            if r["fmt"] == "png":
                assert np.array_equal(arr, exp)

    def test_encode_row_matches_cycle(self):
        data = encode_row(0)
        assert data[:8] == b"\x89PNG\r\n\x1a\n"  # i=0 -> png

    def test_tile_grid(self):
        g = tile_grid_pdf(0, 3)
        assert len(g) == 1 + 4 + 16 + 64
        world = g[g.z == 0].iloc[0]
        assert world["minx"] < -20037508 and world["maxx"] > 20037508
        ring = parse_wkb_polygon(world["wkb"])
        assert ring.shape == (5, 2)
        assert np.array_equal(ring[0], ring[-1])

    def test_caption_points(self):
        a = caption_points_pdf(50)
        b = caption_points_pdf(50)
        assert a.equals(b)
        assert (a["cell_r7"].to_numpy() >> 58 == 7).all()


class TestPalettedPng:
    """Paletted PNG (color type 3 + PLTE) and -expand through the color
    table (frmts/png + gdal_translate_lib.cpp -expand)."""

    def test_roundtrip_indices_and_palette(self):
        import numpy as np

        from gdal_spark.codecs.png import (
            decode_png, encode_png_paletted, png_palette,
        )
        from gdal_spark.codecs.registry import decode, palette

        rng_idx = (np.arange(40 * 30, dtype=np.int64) * 3 % 251
                   ).astype(np.uint8).reshape(30, 40)
        pal = np.stack([(7 * np.arange(251) + 1) % 256,
                        (13 * np.arange(251) + 5) % 256,
                        (29 * np.arange(251) + 11) % 256], 1).astype(np.uint8)
        data = encode_png_paletted(rng_idx, pal)
        np.testing.assert_array_equal(decode_png(data), rng_idx)
        np.testing.assert_array_equal(png_palette(data), pal)
        # registry dispatch: decode -> indices, palette -> PLTE
        np.testing.assert_array_equal(decode(data), rng_idx)
        np.testing.assert_array_equal(palette(data), pal)

    def test_palette_none_for_gray(self):
        import numpy as np

        from gdal_spark.codecs.png import encode_png, png_palette
        from gdal_spark.codecs.registry import palette

        data = encode_png(np.zeros((4, 4), np.uint8))
        assert png_palette(data) is None
        assert palette(b"FAKJ1234") is None

    def test_expand_rgb_rgba_gray(self, spark):
        import numpy as np

        from gdal_spark.codecs.registry import decode
        from gdal_spark.fixtures.images import (
            palette_table, paletted_images_df,
        )
        from gdal_spark.operators.rasterops import translate

        imgs = paletted_images_df(spark, 3)
        pal = palette_table()
        for mode, nb in (("rgb", 3), ("rgba", 4), ("gray", 1)):
            rows = translate(imgs, expand=mode).select(
                "image_id", "bytes").toPandas()
            assert len(rows) == 3
            for r in rows.itertuples(index=False):
                a = decode(r.bytes)
                i = int(r.image_id[3:])
                from gdal_spark.fixtures.images import H_CYCLE, W_CYCLE
                w, h = W_CYCLE[i % 5], H_CYCLE[i % 5]
                flat = np.arange(w * h, dtype=np.int64)
                idx = ((flat * 3) % 251).reshape(h, w)
                want = pal[idx]
                if mode == "rgba":
                    want = np.concatenate(
                        [want, np.full((h, w, 1), 255, np.uint8)], axis=2)
                elif mode == "gray":
                    want = want[:, :, 0]
                np.testing.assert_array_equal(a, want)


class TestStripedTiff:
    """Striped (RowsPerStrip) baseline TIFF — the layout gdal_translate
    writes by default; the reference reads it through the strip path of
    frmts/gtiff/gtiffdataset.cpp:1566."""

    def test_roundtrip_shapes_and_compressions(self):
        import numpy as np

        from gdal_spark.codecs.cog import decode_cog, encode_striped_tiff
        from gdal_spark.codecs.registry import decode, identify

        rng = np.random.default_rng(11)
        for h, w, bands, rsp, comp in [
            (20, 20, 3, 16, "deflate"), (300, 257, 3, 16, "none"),
            (512, 512, 1, 64, "deflate"), (97, 33, 2, 7, "deflate"),
            (5, 5, 3, 100, "none"),
        ]:
            a = rng.integers(0, 256, size=(h, w, bands)).astype(np.uint8)
            if bands == 1:
                a = a[:, :, 0]
            gt = [100.0, 10.0, 0.0, 200.0, 0.0, -10.0]
            blob = encode_striped_tiff(a, gt, rows_per_strip=rsp,
                                       compression=comp)
            back, nifd, gt2 = decode_cog(blob)
            np.testing.assert_array_equal(back, a)
            assert nifd == 1 and gt2 == gt
            # registry identify + dispatch: same GTiff driver as tiled
            assert identify(blob) == "GTiff"
            np.testing.assert_array_equal(decode(blob), a)

    def test_window_reads_touch_exact_strips(self):
        import numpy as np

        from gdal_spark.codecs.cog import (decode_cog_window,
                                           encode_striped_tiff)
        from gdal_spark.fixtures.images import make_pixels

        a = make_pixels(300, 280)
        rsp = 16
        blob = encode_striped_tiff(a, rows_per_strip=rsp)
        rng = np.random.default_rng(4)
        for _ in range(12):
            x0 = int(rng.integers(0, 295))
            y0 = int(rng.integers(0, 275))
            w = int(rng.integers(1, 300 - x0))
            h = int(rng.integers(1, 280 - y0))
            win, nstrips = decode_cog_window(blob, x0, y0, w, h)
            np.testing.assert_array_equal(win, a[y0:y0 + h, x0:x0 + w])
            assert nstrips == (y0 + h - 1) // rsp - y0 // rsp + 1
        # fully-outside window -> empty, zero strips read
        win, nstrips = decode_cog_window(blob, 0, 400, 10, 10)
        assert win.shape[:2] == (0, 0) and nstrips == 0
