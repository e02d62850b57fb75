"""Cross-validate the pure-python GIF codec (operators/gif) against the
JVM's ``javax.imageio`` GIF plugin — the same borrow-the-JVM strategy as
the JPEG and Avro conformance suites. GIF is LOSSLESS, so both
directions must agree EXACTLY (no tolerance band):

- our encoder's bytes must decode pixel-identical in ImageIO;
- ImageIO-encoded bytes must decode pixel-identical in our decoder.
"""

from __future__ import annotations

from muninn_avro_to_parquet_spark.operators import gif


def _palette_gradient(w, h):
    # bounded distinct colors (GIF palette max 256), still structured
    return [
        ((x * 16) % 256 // 32 * 32, (y * 24) % 256 // 32 * 32, ((x + y) * 8) % 256 // 64 * 64)
        for y in range(h)
        for x in range(w)
    ]


def _imageio_decode(spark, data: bytes):
    jvm = spark._jvm
    img = jvm.javax.imageio.ImageIO.read(jvm.java.io.ByteArrayInputStream(data))
    if img is None:
        raise AssertionError("ImageIO could not parse the GIF bytes")
    w, h = img.getWidth(), img.getHeight()
    arr = img.getRGB(0, 0, w, h, None, 0, w)
    return w, h, [((v >> 16) & 255, (v >> 8) & 255, v & 255) for v in arr]


def _imageio_encode(spark, w, h, pix) -> bytes:
    jvm = spark._jvm
    gw = spark.sparkContext._gateway
    bi = jvm.java.awt.image.BufferedImage(w, h, 1)  # TYPE_INT_RGB
    ja = gw.new_array(jvm.int, w * h)
    for i, (r, g, b) in enumerate(pix):
        ja[i] = (r << 16) | (g << 8) | b
    bi.setRGB(0, 0, w, h, ja, 0, w)
    baos = jvm.java.io.ByteArrayOutputStream()
    assert jvm.javax.imageio.ImageIO.write(bi, "gif", baos)
    return bytes(baos.toByteArray())


def test_our_encode_imageio_decodes_exact(spark):
    w, h = 37, 21  # non-power dims, multi-sub-block LZW
    pix = _palette_gradient(w, h)
    data = gif.encode_gif(w, h, pix)
    jw, jh, jdec = _imageio_decode(spark, data)
    assert (jw, jh) == (w, h)
    assert jdec == pix  # lossless: exact


def test_imageio_encode_our_decode_exact(spark):
    w, h = 29, 33
    pix = _palette_gradient(w, h)
    data = _imageio_encode(spark, w, h, pix)
    # decoder agreement on identical bytes: ours vs ImageIO's own decode
    jw, jh, jdec = _imageio_decode(spark, data)
    ow, oh, ours = gif.decode_gif(data)
    assert (ow, oh) == (jw, jh) == (w, h)
    assert ours == jdec


def test_lzw_dictionary_reset_round_trip(spark):
    # enough distinct runs to push the LZW dictionary to its 4096 cap and
    # force a mid-stream clear in the encoder
    w, h = 128, 96
    pix = [
        (((x * 7 + y * 3) % 16) * 16, ((x + 2 * y) % 16) * 16, ((x * y) % 4) * 64)
        for y in range(h)
        for x in range(w)
    ]
    data = gif.encode_gif(w, h, pix)
    assert gif.decode_gif(data)[2] == pix
    jw, jh, jdec = _imageio_decode(spark, data)
    assert (jw, jh) == (w, h) and jdec == pix


def test_interlaced_gif_decodes(spark):
    # build an interlaced stream by hand: encode normally, then rewrite
    # the image descriptor flag and reorder rows into pass order
    w, h = 16, 13
    pix = [((x * 16) % 256, (y * 16) % 256, 0) for y in range(h) for x in range(w)]
    rows = [pix[r * w : (r + 1) * w] for r in range(h)]
    pass_rows = []
    for start, step in ((0, 8), (4, 8), (2, 4), (1, 2)):
        for y in range(start, h, step):
            pass_rows.append(rows[y])
    inter_pix = [p for row in pass_rows for p in row]
    data = bytearray(gif.encode_gif(w, h, inter_pix))
    desc = data.index(0x2C, 13)  # first image descriptor (after header+GCT)
    data[desc + 9] |= 0x40  # set the interlace flag
    got_w, got_h, got = gif.decode_gif(bytes(data))
    assert (got_w, got_h) == (w, h)
    assert got == pix  # de-interlaced back to natural row order
    jw, jh, jdec = _imageio_decode(spark, bytes(data))
    assert jdec == got  # ImageIO agrees on the interlaced stream


def test_rejects_non_gif():
    import pytest

    with pytest.raises(ValueError, match="signature"):
        gif.decode_gif(b"NOTAGIF0" * 4)


def test_interlaced_encode_round_trips_and_imageio_agrees(spark):
    """r10: the ENCODER's native interlace mode (r9 had decode only, and
    the decode fixture was a hand-rewritten stream). Our interlaced
    bytes must de-interlace back exactly in BOTH decoders."""
    w, h = 23, 17  # non-power dims so pass boundaries land mid-stream
    pix = _palette_gradient(w, h)
    data = gif.encode_gif(w, h, pix, interlace=True)
    assert data[:6] == b"GIF89a"
    # our own decoder round-trips
    ow, oh, ours = gif.decode_gif(data)
    assert (ow, oh) == (w, h) and ours == pix
    # independent decoder agrees on the same interlaced bytes
    jw, jh, jdec = _imageio_decode(spark, data)
    assert (jw, jh) == (w, h) and jdec == pix
    # the flag is actually set (not a progressive-order plain stream)
    desc = data.index(0x2C, 13)
    assert data[desc + 9] & 0x40


def test_interlaced_and_plain_encode_same_pixels_differ_only_in_order():
    w, h = 16, 16
    pix = _palette_gradient(w, h)
    plain = gif.encode_gif(w, h, pix)
    inter = gif.encode_gif(w, h, pix, interlace=True)
    assert plain != inter
    assert gif.decode_gif(plain)[2] == gif.decode_gif(inter)[2] == pix
