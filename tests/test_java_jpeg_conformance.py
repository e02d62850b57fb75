"""Cross-validate the pure-python baseline JPEG codec (operators/jpeg)
against an INDEPENDENT implementation that ships in this image: the JVM's
``javax.imageio`` (same borrow-the-JVM strategy as
test_java_avro_conformance.py).

Two directions:
- our encoder's bytes must decode correctly in ImageIO (spec-compliant
  output);
- ImageIO's bytes (which it writes 4:2:0-subsampled — a different MCU
  layout than our 4:4:4 output) must decode in our decoder to within a
  small rounding tolerance of ImageIO's OWN decode of the same bytes —
  decoder agreement on identical input, which isolates conformance from
  lossy-compression error.
"""

from __future__ import annotations

import pytest

from muninn_avro_to_parquet_spark.operators import jpeg


def _gradient(w, h, f):
    return [f(x, y) for y in range(h) for x in range(w)]


def _imageio_decode(spark, data: bytes):
    jvm = spark._jvm
    img = jvm.javax.imageio.ImageIO.read(jvm.java.io.ByteArrayInputStream(data))
    if img is None:
        raise AssertionError("ImageIO could not parse our JPEG output")
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
    assert jvm.javax.imageio.ImageIO.write(bi, "jpg", baos)
    return bytes(baos.toByteArray())


def _max_err(a, b):
    return max(abs(x - y) for p, q in zip(a, b) for x, y in zip(p, q))


def test_our_encode_imageio_decodes(spark):
    w, h = 48, 32
    pix = _gradient(
        w, h, lambda x, y: (int(255 * x / 47), int(255 * y / 31), int(255 * (x + y) / 78))
    )
    data = jpeg.encode_jpeg(w, h, pix, quality=92)
    jw, jh, jdec = _imageio_decode(spark, data)
    assert (jw, jh) == (w, h)
    # fidelity vs the original (lossy bound at q92 on smooth content)
    assert _max_err(pix, jdec) <= 8
    # decoder agreement: ImageIO and our decoder read the SAME bytes
    _, _, ours = jpeg.decode_jpeg(data)
    assert _max_err(ours, jdec) <= 4


def test_our_encode_with_restarts_imageio_decodes(spark):
    w, h = 40, 24
    pix = _gradient(w, h, lambda x, y: (int(255 * x / 39), 60, int(255 * y / 23)))
    data = jpeg.encode_jpeg(w, h, pix, quality=85, restart_interval=2)
    jw, jh, jdec = _imageio_decode(spark, data)
    assert (jw, jh) == (w, h)
    assert _max_err(pix, jdec) <= 10
    _, _, ours = jpeg.decode_jpeg(data)
    assert _max_err(ours, jdec) <= 4


def test_imageio_encode_we_decode_420(spark):
    """ImageIO writes 4:2:0 — our decoder's subsampled-MCU + chroma
    upsample path, judged against ImageIO's own decode of the identical
    bytes (chroma upsampling kernels differ legitimately; on smooth
    content the gap stays small)."""
    w, h = 36, 28
    pix = _gradient(
        w, h, lambda x, y: (30 + 6 * x, 220 - 6 * y, 40 + 3 * (x + y))
    )
    data = _imageio_encode(spark, w, h, pix)
    ow, oh, ours = jpeg.decode_jpeg(data)
    assert (ow, oh) == (w, h)
    jw, jh, jdec = _imageio_decode(spark, data)
    assert (jw, jh) == (w, h)
    assert _max_err(ours, jdec) <= 12
    # luma plane agreement is tighter (no chroma interpolation involved)
    _, _, luma = jpeg.decode_jpeg_luma(data)
    jluma = sum(
        0.299 * r + 0.587 * g + 0.114 * b for r, g, b in jdec
    ) / (w * h * 255.0)
    assert abs(luma - jluma) < 0.01


def test_grayscale_single_component(spark):
    """A 1-component (grayscale) JPEG from ImageIO decodes through the
    single-plane path. Comparison is against ImageIO's RAW RASTER — its
    ``getRGB`` additionally converts the linear-gray colorspace to sRGB
    (a gamma curve on top of the JPEG payload), which is color
    management, not JPEG decoding."""
    jvm = spark._jvm
    gw = spark.sparkContext._gateway
    w, h = 24, 16
    vals = [int(255 * (x + y) / 38) for y in range(h) for x in range(w)]
    bi = jvm.java.awt.image.BufferedImage(w, h, 10)  # TYPE_BYTE_GRAY
    ja = gw.new_array(jvm.int, w * h)
    for i, v in enumerate(vals):
        ja[i] = (v << 16) | (v << 8) | v
    bi.setRGB(0, 0, w, h, ja, 0, w)
    baos = jvm.java.io.ByteArrayOutputStream()
    assert jvm.javax.imageio.ImageIO.write(bi, "jpg", baos)
    data = bytes(baos.toByteArray())
    ow, oh, ours = jpeg.decode_jpeg(data)
    assert (ow, oh) == (w, h)
    assert all(r == g == b for r, g, b in ours)
    img = jvm.javax.imageio.ImageIO.read(jvm.java.io.ByteArrayInputStream(data))
    raster = img.getRaster()
    jgray = [raster.getSample(x, y, 0) for y in range(h) for x in range(w)]
    assert max(abs(a[0] - b) for a, b in zip(ours, jgray)) <= 1


def test_unsupported_sof_and_garbage_raise():
    with pytest.raises(ValueError, match="SOI"):
        jpeg.decode_jpeg(b"nonsense")
    # progressive now DECODES (r10); a scan-less SOF2 skeleton ends at
    # EOI with no coefficients — still a loud error, not silent pixels
    import struct

    sof2 = (
        b"\xff\xd8"
        + b"\xff\xc2"
        + struct.pack(">H", 11)
        + struct.pack(">BHHB", 8, 8, 8, 1)
        + bytes([1, 0x11, 0])
    )
    with pytest.raises(ValueError, match="no scan"):
        jpeg.decode_jpeg(sof2 + b"\xff\xd9")
    # arithmetic-coded (SOF9) stays an honest reject
    sof9 = (
        b"\xff\xd8"
        + b"\xff\xc9"
        + struct.pack(">H", 11)
        + struct.pack(">BHHB", 8, 8, 8, 1)
        + bytes([1, 0x11, 0])
    )
    with pytest.raises(ValueError, match="unsupported"):
        jpeg.decode_jpeg(sof9 + b"\xff\xd9")


def test_non_interleaved_multi_scan_raises_value_error():
    """ADVICE r8: a baseline JPEG whose first SOS selects only a subset
    of the frame components (non-interleaved / multi-scan layout) must
    hit the documented ValueError contract, not a KeyError."""
    import struct

    w, h = 16, 16
    pix = _gradient(w, h, lambda x, y: (16 * x, 16 * y, 128))
    data = jpeg.encode_jpeg(w, h, pix, quality=75)
    # rewrite the SOS header in place: ns 3 -> 1, keep only component 1
    i = data.find(b"\xff\xda")
    assert i >= 0
    (seg_len,) = struct.unpack(">H", data[i + 2 : i + 4])
    ns = data[i + 4]
    assert ns == 3 and seg_len == 2 + 1 + 2 * ns + 3
    first_comp = data[i + 5 : i + 7]
    tail = data[i + 4 + 1 + 2 * ns : i + 2 + seg_len]  # Ss/Se/AhAl bytes
    new_sos = b"\xff\xda" + struct.pack(">H", 2 + 1 + 2 + 3) + b"\x01" + first_comp + tail
    patched = data[:i] + new_sos + data[i + 2 + seg_len :]
    with pytest.raises(ValueError, match="multi-scan"):
        jpeg.decode_jpeg(patched)


def test_roundtrip_determinism_and_quality_ladder():
    w, h = 16, 16
    pix = _gradient(w, h, lambda x, y: (16 * x, 16 * y, 128))
    a = jpeg.encode_jpeg(w, h, pix, quality=75)
    b = jpeg.encode_jpeg(w, h, pix, quality=75)
    assert a == b  # bit-deterministic
    small = jpeg.encode_jpeg(w, h, pix, quality=30)
    big = jpeg.encode_jpeg(w, h, pix, quality=95)
    assert len(small) < len(big)
    for q, tol in [(30, 40), (75, 12), (95, 6)]:
        _, _, dec = jpeg.decode_jpeg(jpeg.encode_jpeg(w, h, pix, quality=q))
        assert _max_err(pix, dec) <= tol, q


def test_jpeg_through_resize_and_dhash_seams(spark):
    """JPEG payloads flow through the same executor-side pixel seam as
    BMP/PPM: resize_images and dhash_images accept .jpg bytes, and the
    perceptual property holds — a 2x upscaled re-encode of the same
    image dhashes identically to the original."""
    from pyspark.sql import functions as F

    from muninn_avro_to_parquet_spark.operators import multimodal

    w, h = 32, 32
    pix = _gradient(w, h, lambda x, y: (8 * x, 8 * y, 120))
    small = jpeg.encode_jpeg(w, h, pix, quality=92)
    big_pix = [pix[(y // 2) * w + (x // 2)] for y in range(2 * h) for x in range(2 * w)]
    big = jpeg.encode_jpeg(2 * w, 2 * h, big_pix, quality=92)
    df = spark.createDataFrame(
        [(1, bytearray(small)), (2, bytearray(big))], "doc_id long, media binary"
    )
    resized = {
        r["doc_id"]: r
        for r in multimodal.resize_images(df, max_w=8, max_h=8).collect()
    }
    assert resized[1]["width"] == 8 and resized[2]["width"] == 8
    assert resized[1]["src_width"] == 32 and resized[2]["src_width"] == 64
    hashes = {
        r["doc_id"]: r["dhash"] for r in multimodal.dhash_images(df).collect()
    }
    assert hashes[1] == hashes[2]


def _imageio_encode_progressive(spark, bi) -> bytes:
    jvm = spark._jvm
    writer = jvm.javax.imageio.ImageIO.getImageWritersByFormatName("jpg").next()
    param = writer.getDefaultWriteParam()
    param.setProgressiveMode(jvm.javax.imageio.ImageWriteParam.MODE_DEFAULT)
    baos = jvm.java.io.ByteArrayOutputStream()
    ios = jvm.javax.imageio.ImageIO.createImageOutputStream(baos)
    writer.setOutput(ios)
    writer.write(None, jvm.javax.imageio.IIOImage(bi, None, None), param)
    ios.flush()
    return bytes(baos.toByteArray())


def test_progressive_gray_decoder_agreement(spark):
    """Progressive (SOF2) grayscale: no chroma upsampling in the loop, so
    decoder agreement on identical bytes isolates the multi-scan
    coefficient accumulation (DC/AC first + refinement, EOBRUN) — must
    match ImageIO's own decode to within IDCT rounding (<=1)."""
    jvm = spark._jvm
    w, h = 40, 24
    bi = jvm.java.awt.image.BufferedImage(w, h, 10)  # TYPE_BYTE_GRAY
    raster = bi.getRaster()
    vals = [(x * 37 + y * 11) % 256 for y in range(h) for x in range(w)]
    for y in range(h):
        for x in range(w):
            raster.setSample(x, y, 0, vals[y * w + x])
    data = _imageio_encode_progressive(spark, bi)
    assert b"\xff\xc2" in data  # really progressive
    img = jvm.javax.imageio.ImageIO.read(jvm.java.io.ByteArrayInputStream(data))
    jgray = [img.getRaster().getSample(x, y, 0) for y in range(h) for x in range(w)]
    ow, oh, ours = jpeg.decode_jpeg(data)
    assert (ow, oh) == (w, h)
    assert max(abs(p[0] - g) for p, g in zip(ours, jgray)) <= 1


def test_progressive_color_decoder_agreement(spark):
    """Progressive 4:2:0 color: agreement within the chroma-upsampling
    style band (ImageIO's fancy upsampling vs our box replication —
    same class of delta the baseline 4:2:0 tests carry)."""
    jvm = spark._jvm
    gw = spark.sparkContext._gateway
    w, h = 48, 32
    pix = _gradient(
        w, h, lambda x, y: (int(255 * x / 47), int(255 * y / 31), int(255 * (x + y) / 78))
    )
    bi = jvm.java.awt.image.BufferedImage(w, h, 1)
    ja = gw.new_array(jvm.int, w * h)
    for i, (r, g, b) in enumerate(pix):
        ja[i] = (r << 16) | (g << 8) | b
    bi.setRGB(0, 0, w, h, ja, 0, w)
    data = _imageio_encode_progressive(spark, bi)
    assert b"\xff\xc2" in data
    jw, jh, jdec = _imageio_decode(spark, data)
    ow, oh, ours = jpeg.decode_jpeg(data)
    assert (ow, oh) == (jw, jh) == (w, h)
    assert _max_err(ours, jdec) <= 8
    # and the decode is still faithful to the SOURCE image
    assert _max_err(ours, pix) <= 14


def test_progressive_vs_baseline_same_source(spark):
    """OUR decoder, ImageIO's two encodings of one image: progressive
    and baseline decodes must land within the lossy-noise band of each
    other — a scan-accumulation bug would separate them widely."""
    jvm = spark._jvm
    gw = spark.sparkContext._gateway
    w, h = 32, 32
    pix = _gradient(w, h, lambda x, y: ((x * 8) % 256, (y * 8) % 256, ((x + y) * 4) % 256))
    bi = jvm.java.awt.image.BufferedImage(w, h, 1)
    ja = gw.new_array(jvm.int, w * h)
    for i, (r, g, b) in enumerate(pix):
        ja[i] = (r << 16) | (g << 8) | b
    bi.setRGB(0, 0, w, h, ja, 0, w)
    prog = _imageio_encode_progressive(spark, bi)
    base = _imageio_encode(spark, w, h, pix)
    assert b"\xff\xc2" in prog and b"\xff\xc2" not in base
    _, _, dec_p = jpeg.decode_jpeg(prog)
    _, _, dec_b = jpeg.decode_jpeg(base)
    assert _max_err(dec_p, dec_b) <= 8
