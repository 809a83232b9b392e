"""Operators beyond reference parity: as-of join (oracle: DuckDB's
native ASOF JOIN), top-k per group, sessionization, streaming twins."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events(spark):
    from yardstick_spark.sources import read_table

    return read_table(spark, "/root/testdata/sf0.01/events.parquet")


def test_asof_join_matches_duckdb(spark, events):
    from yardstick_spark.operators import asof_join

    purchases = events.filter("event_type = 'purchase'")
    clicks = events.filter("event_type = 'click'").select(
        "user_id", "ts", F.col("value").alias("click_value")
    )
    got = (
        asof_join(purchases, clicks, on="user_id",
                  left_ts="ts", right_ts="ts")
        .select("event_id", F.round("click_value_asof", 2).alias("cv"))
    )
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW events AS SELECT * FROM "
        "'/root/testdata/sf0.01/events.parquet'"
    )
    want = con.sql("""
        SELECT p.event_id, ROUND(c.value, 2) AS cv
        FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
          ON p.user_id = c.user_id AND p.ts >= c.ts
    """).fetchall()
    assert sorted(map(tuple, got.collect())) == sorted(want)


def test_topk_per_group(spark, events):
    from yardstick_spark.operators import top_k_per_group

    got = top_k_per_group(
        events, ["event_type"], "value", k=3
    ).groupBy("event_type").count().collect()
    assert all(r["count"] == 3 for r in got)


def test_sessionize_batch_matches_duckdb(spark, events):
    from yardstick_spark.streaming import sessionize_batch

    got = sessionize_batch(events, gap_minutes=30).select(
        "user_id", "session_seq", "n_events", "session_value"
    )
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW events AS SELECT * FROM "
        "'/root/testdata/sf0.01/events.parquet'"
    )
    want = con.sql("""
        WITH g AS (
          SELECT user_id, ts, value,
            CASE WHEN ts - LAG(ts) OVER w > INTERVAL 30 MINUTE
                 OR LAG(ts) OVER w IS NULL THEN 1 ELSE 0 END AS is_new
          FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ), s AS (
          SELECT user_id, value,
            SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts
              ROWS UNBOUNDED PRECEDING) AS session_seq
          FROM g
        )
        SELECT user_id, session_seq, COUNT(*) AS n_events,
               ROUND(SUM(value), 2) AS session_value
        FROM s GROUP BY user_id, session_seq
    """).fetchall()
    assert sorted(map(tuple, got.collect())) == sorted(want)


def test_streaming_tumbling_matches_batch(spark, tmp_path):
    from yardstick_spark.streaming import (
        stream_events,
        tumbling_counts_batch,
        tumbling_counts_stream,
    )
    from yardstick_spark.sources import read_table

    sf = "/root/testdata/sf0.001"
    stream = tumbling_counts_stream(stream_events(spark, sf), minutes=60)
    q = (
        stream.writeStream.format("memory")
        .queryName("tumbling_test")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(
        tuple(r) for r in spark.table("tumbling_test").collect()
    )
    batch = tumbling_counts_batch(
        read_table(spark, f"{sf}/events.parquet"), minutes=60
    )
    want = sorted(tuple(r) for r in batch.collect())
    assert got == want


def test_streaming_sliding_matches_batch(spark, tmp_path):
    from yardstick_spark.sources import read_table
    from yardstick_spark.streaming import (
        sliding_counts_batch,
        sliding_counts_stream,
        stream_events,
    )

    sf = "/root/testdata/sf0.001"
    stream = sliding_counts_stream(stream_events(spark, sf), minutes=60,
                                   slide_minutes=15)
    q = (
        stream.writeStream.format("memory")
        .queryName("sliding_test")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt_sl"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(tuple(r) for r in spark.table("sliding_test").collect())
    batch = sliding_counts_batch(
        read_table(spark, f"{sf}/events.parquet"), minutes=60,
        slide_minutes=15,
    )
    want = sorted(tuple(r) for r in batch.collect())
    assert got == want
    # every event covers size/slide = 4 windows: total n is 4x the rows
    n_events = read_table(spark, f"{sf}/events.parquet").count()
    assert sum(r[2] for r in want) == 4 * n_events


def test_streaming_sessions_run(spark, tmp_path):
    from yardstick_spark.streaming import sessionize_stream, stream_events

    sf = "/root/testdata/sf0.001"
    stream = sessionize_stream(stream_events(spark, sf), gap_minutes=30)
    q = (
        stream.writeStream.format("memory")
        .queryName("sessions_test")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.table("sessions_test").count()
    assert rows > 0


def test_ppm_wav_roundtrip_and_errors():
    import numpy as np
    import pytest as _pytest

    from yardstick_spark.llm import parse_ppm, parse_wav, write_ppm, write_wav

    rgb = bytes(range(2 * 3 * 3)) * 1  # 2x3 image, distinct byte values
    w, h, arr = parse_ppm(write_ppm(2, 3, rgb))
    assert (w, h) == (2, 3)
    assert arr.tobytes() == rgb

    # arbitrary whitespace between header fields is legal PPM
    assert parse_ppm(b"P6\n2 3\n255\n" + rgb)[2].tobytes() == rgb

    samples = np.array([0, 1, -1, 32767, -32768, 123], dtype=np.int16)
    out = parse_wav(write_wav(samples, sample_rate=8000))
    assert np.array_equal(out, samples)

    with _pytest.raises(ValueError):
        parse_ppm(b"P5\n2 2\n255\n" + b"\0" * 4)  # grayscale PGM
    with _pytest.raises(ValueError):
        parse_wav(b"RIFFxxxxWAVE")  # no data chunk


def test_png_roundtrip_all_filters_and_rejects():
    """write_png/parse_png round-trip every (shape, channels) corner
    against every scanline filter type — including width 1, height 1
    and per-row filter mixes — and a hand-assembled filter-0 PNG built
    from raw zlib/struct validates the chunk layout independently of
    the encoder.  Unsupported containers (16-bit, palette, Adam7)
    raise ValueError instead of decoding garbage."""
    import struct
    import zlib

    import numpy as np
    import pytest as _pytest

    from yardstick_spark.llm import parse_png, write_png
    from yardstick_spark.llm.multimodal import PNG_SIG

    rng = np.random.default_rng(7)
    for (w, h, ch) in [(13, 9, 3), (1, 5, 3), (7, 1, 1), (16, 16, 4),
                       (3, 2, 1)]:
        px = rng.integers(0, 256, size=w * h * ch,
                          dtype=np.uint8).tobytes()
        for filt in [0, 1, 2, 3, 4,
                     [(y * 3 + 1) % 5 for y in range(h)]]:
            got = parse_png(write_png(w, h, px, channels=ch,
                                      filters=filt))
            assert got[:3] == (w, h, ch)
            assert got[3].tobytes() == px, (w, h, ch, filt)

    def chunk(t, d):
        return (struct.pack(">I", len(d)) + t + d
                + struct.pack(">I", zlib.crc32(t + d) & 0xFFFFFFFF))

    raw = bytes([0, 10, 20, 30, 40, 50, 60, 0, 70, 80, 90, 100, 110, 120])
    png = (PNG_SIG + chunk(b"IHDR",
                           struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 0))
           + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b""))
    assert parse_png(png)[3].tolist() == [10, 20, 30, 40, 50, 60, 70,
                                          80, 90, 100, 110, 120]
    for depth, color, inter in [(16, 2, 0), (8, 3, 0), (8, 2, 1)]:
        bad = (PNG_SIG
               + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, depth,
                                            color, 0, 0, inter))
               + chunk(b"IDAT", zlib.compress(raw)))
        with _pytest.raises(ValueError):
            parse_png(bad)
    with _pytest.raises(ValueError):
        parse_png(b"not a png")


def test_jpeg_roundtrip_closed_form_and_rejects():
    """Baseline JPEG codec: (a) every constant-block value 0..255
    decodes to the exact DC-only closed form (the lossy path is
    analytic for constant tiles — the mm_decode_jpeg oracle's
    foundation), including the 63.5-style quantization ties the
    two-stage rounding grid protects; (b) general images round-trip
    within the flat-16 quantization error bound; (c) zigzag is the
    standard T.81 order; (d) non-multiple-of-8 dims pad and crop;
    (e) progressive/multi-component/non-JPEG payloads raise."""
    import numpy as np
    import pytest as _pytest

    from yardstick_spark.llm import parse_jpeg, write_jpeg
    from yardstick_spark.llm.multimodal import _JPEG_Q00, _jpeg_zigzag

    assert _jpeg_zigzag()[:10] == [0, 1, 8, 16, 9, 2, 3, 10, 17, 24]

    def closed(v):
        dc = np.sign(8 * (v - 128) / _JPEG_Q00) * np.floor(
            abs(8 * (v - 128) / _JPEG_Q00) + 0.5)
        return int(np.floor(np.clip(
            np.round(dc * _JPEG_Q00 / 8.0 + 128, 6), 0, 255) + 0.5))

    for v in range(0, 256, 7):
        img = np.full((8, 16), v, np.uint8)
        jw, jh, ch, dec = parse_jpeg(write_jpeg(16, 8, img.tobytes()))
        assert (jw, jh, ch) == (16, 8, 1)
        assert (dec == closed(v)).all(), v
    # ties: v=255 -> 63.5 quant boundary; v=1 -> -63.5
    for v in (255, 1):
        _, _, _, dec = parse_jpeg(write_jpeg(8, 8,
                                             bytes([v] * 64)))
        assert (dec == closed(v)).all(), v
    # general content: lossy but bounded under the flat-16 table
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, size=(24, 40), dtype=np.uint8)
    _, _, _, dec = parse_jpeg(write_jpeg(40, 24, img.tobytes()))
    err = np.abs(dec.reshape(24, 40).astype(int) - img.astype(int))
    assert err.max() <= 40 and err.mean() <= 8
    # padding + crop (13x10 is not a block multiple)
    img3 = np.full((10, 13), 77, np.uint8)
    jw, jh, ch3, dec3 = parse_jpeg(write_jpeg(13, 10, img3.tobytes()))
    assert (jw, jh, ch3) == (13, 10, 1) and (dec3 == closed(77)).all()
    # rejects
    j = bytearray(write_jpeg(8, 8, bytes(64)))
    i = j.find(b"\xff\xc0")
    j[i + 1] = 0xC2  # forge progressive SOF2
    with _pytest.raises(ValueError):
        parse_jpeg(bytes(j))
    with _pytest.raises(ValueError):
        parse_jpeg(b"not a jpeg")
    with _pytest.raises(ValueError):
        parse_jpeg(write_jpeg(8, 8, bytes(64))[:40])  # truncated
    # DRI segment in the marker walk: loud reject, not garbage decode
    j = bytearray(write_jpeg(8, 8, bytes(64)))
    i = j.find(b"\xff\xda")
    j[i:i] = b"\xff\xdd\x00\x04\x00\x08"  # DRI, interval 8
    with _pytest.raises(ValueError, match="restart"):
        parse_jpeg(bytes(j))
    # RSTn byte pair mid-scan: loud reject, not a plain data byte
    j = bytearray(write_jpeg(8, 8, bytes(64)))
    i = j.find(b"\xff\xda")
    sos_len = int.from_bytes(j[i + 2:i + 4], "big")
    j[i + 2 + sos_len:i + 2 + sos_len] = b"\xff\xd0"  # RST0 at scan start
    with _pytest.raises(ValueError, match="restart|marker"):
        parse_jpeg(bytes(j))


def test_huffman_lut_decodes_arbitrary_canonical_tables():
    """The 2^16 peek-LUT reader must agree with a per-bit reference
    walk for ANY canonical Huffman table, not just the single DHT our
    encoder emits: random tables (code lengths 1..16, incl. max-length
    codes), random symbol streams, bit-packed with FF-stuffing —
    decode must return the exact symbol sequence, and invalid
    prefixes must raise."""
    import random

    from yardstick_spark.llm.multimodal import _BitReader, _huff_lut

    rng = random.Random(42)
    for trial in range(25):
        # random canonical code: draw lengths until Kraft-complete
        # enough; assign codes canonically like the DHT parser does
        nsyms = rng.randint(2, 40)
        lens = sorted(rng.randint(1, 16) for _ in range(nsyms))
        codes, code, prev = {}, 0, 0
        ok = True
        for i, ln in enumerate(lens):
            code <<= (ln - prev)
            if code >= (1 << ln):  # over-full: skip this draw
                ok = False
                break
            codes[(ln, code)] = i + 1  # symbols 1..n (0 reserved)
            code += 1
            prev = ln
        if not ok:
            continue
        lut = _huff_lut(codes)
        inv = {sym: (ln, c) for (ln, c), sym in codes.items()}
        syms = [rng.choice(list(inv)) for _ in range(200)]
        # pack MSB-first with JPEG FF-stuffing, pad with 1s
        acc, n, out = 0, 0, bytearray()
        for s in syms:
            ln, c = inv[s]
            acc = (acc << ln) | c
            n += ln
            while n >= 8:
                b = (acc >> (n - 8)) & 0xFF
                out.append(b)
                if b == 0xFF:
                    out.append(0x00)
                n -= 8
            acc &= (1 << n) - 1
        if n:
            b = ((acc << (8 - n)) | ((1 << (8 - n)) - 1)) & 0xFF
            out.append(b)
            if b == 0xFF:
                out.append(0x00)
        br = _BitReader(bytes(out))
        got = [br.huff(lut) for _ in range(len(syms))]
        assert got == syms, f"trial {trial}"


def test_ycbcr_coefficients_derive_from_bt601():
    """Pin the codec's color-transform constants to a first-principles
    BT.601 derivation (Kr=0.299, Kb=0.114; Cb=(B-Y)/(2(1-Kb)),
    Cr=(R-Y)/(2(1-Kr))) instead of to themselves.  The r10 ADVICE
    found the Cr blue coefficient copied wrong into codec AND oracle
    AND test — a self-confirming triple no in-repo check could catch;
    this derivation is the independent witness."""
    import numpy as np

    from yardstick_spark.llm.multimodal import (_rgb_to_ycbcr,
                                                _ycbcr_to_rgb)

    kr, kb = 0.299, 0.114
    kg = 1 - kr - kb
    want_fwd = np.array([
        [kr, kg, kb],
        [-kr / (2 * (1 - kb)), -kg / (2 * (1 - kb)), 0.5],
        [0.5, -kg / (2 * (1 - kr)), -kb / (2 * (1 - kr))],
    ])
    # probe the implementation's linear part with unit impulses: the
    # transform is affine (offset 0/128/128), so column j of the
    # matrix is f(e_j) - f(0).  Use scaled impulses to dodge the
    # integer-grid rounding the codec applies at the 255 grain.
    got = np.empty((3, 3))
    base = np.zeros((1, 1, 3))
    for j in range(3):
        e = np.zeros((1, 1, 3))
        e[..., j] = 255.0
        fe = np.array([float(x) for x in _rgb_to_ycbcr(e)])
        f0 = np.array([float(x) for x in _rgb_to_ycbcr(base)])
        got[:, j] = (fe - f0) / 255.0
    assert np.allclose(got, np.round(want_fwd, 6), atol=2e-3), got
    # inverse: round-tripping the derived matrix must be ~identity on
    # mid-range colors (quantization-grid tolerance)
    for rgb in ((64, 128, 192), (200, 50, 90), (10, 100, 200)):
        arr = np.zeros((1, 1, 3))
        arr[0, 0] = rgb
        y, cb, cr = _rgb_to_ycbcr(arr)
        r2, g2, b2 = _ycbcr_to_rgb(y, cb, cr)
        back = np.array([float(r2), float(g2), float(b2)])
        assert np.abs(back - np.array(rgb)).max() <= 2.0, (rgb, back)


def test_jpeg_color_closed_form_and_roundtrip():
    """4:4:4 color JPEG: constant RGB tiles decode to the full
    RGB -> YCbCr -> DC-quantize -> YCbCr -> RGB closed form on the
    two-stage rounding grid (the mm_decode_jpeg_color oracle's
    foundation), including chroma values that clamp; general color
    content round-trips lossily but bounded."""
    import numpy as np

    from yardstick_spark.llm import parse_jpeg, write_jpeg
    from yardstick_spark.llm.multimodal import _JPEG_Q00

    def ha(x):
        return np.sign(x) * np.floor(np.abs(x) + 0.5)

    def grid(x):
        return np.clip(ha(np.round(x, 6)), 0, 255)

    def chan(c):
        dc = ha(8 * (c - 128) / _JPEG_Q00)
        return np.floor(np.clip(np.round(
            dc * _JPEG_Q00 / 8.0 + 128, 6), 0, 255) + 0.5)

    for (r, g, b) in [(10, 200, 30), (0, 250, 250), (0, 0, 0),
                      (255, 255, 255), (123, 45, 67), (250, 0, 0)]:
        img = np.zeros((8, 8, 3), np.uint8)
        img[..., 0], img[..., 1], img[..., 2] = r, g, b
        w, h, ch, arr = parse_jpeg(write_jpeg(8, 8, img.tobytes(),
                                              channels=3))
        assert (w, h, ch) == (8, 8, 3)
        y = grid(0.299 * r + 0.587 * g + 0.114 * b)
        cb = grid(-0.168736 * r - 0.331264 * g + 0.5 * b + 128)
        cr = grid(0.5 * r - 0.418688 * g - 0.081312 * b + 128)
        y2, cb2, cr2 = chan(y), chan(cb), chan(cr)
        want = (int(grid(y2 + 1.402 * (cr2 - 128))),
                int(grid(y2 - 0.344136 * (cb2 - 128)
                         - 0.714136 * (cr2 - 128))),
                int(grid(y2 + 1.772 * (cb2 - 128))))
        assert (arr.reshape(-1, 3) == want).all(), ((r, g, b), want)
    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, size=(16, 24, 3), dtype=np.uint8)
    _, _, _, arr = parse_jpeg(write_jpeg(24, 16, img.tobytes(),
                                         channels=3))
    err = np.abs(arr.reshape(16, 24, 3).astype(int) - img.astype(int))
    assert err.mean() <= 40  # lossy chroma on noise, but sane


def test_png_jpeg_degenerate_payloads():
    """Codec edge cases: truncated IDAT, scanline/dimension mismatch,
    1x1 images, and zero-byte input all fail loudly or round-trip —
    never garbage."""
    import struct
    import zlib

    import numpy as np
    import pytest as _pytest

    from yardstick_spark.llm import (parse_jpeg, parse_png, write_jpeg,
                                     write_png)
    from yardstick_spark.llm.multimodal import PNG_SIG

    # 1x1 round-trips for both codecs (the all-padding corner)
    assert parse_png(write_png(1, 1, b"\x42", channels=1))[3] \
        .tolist() == [0x42]
    w, h, ch, dec = parse_jpeg(write_jpeg(1, 1, b"\x42"))
    assert (w, h, ch, dec.size) == (1, 1, 1, 1)

    def chunk(t, d):
        return (struct.pack(">I", len(d)) + t + d
                + struct.pack(">I", zlib.crc32(t + d) & 0xFFFFFFFF))

    # PNG whose inflated scanlines don't match IHDR dims
    bad = (PNG_SIG
           + chunk(b"IHDR", struct.pack(">IIBBBBB", 4, 4, 8, 2, 0, 0, 0))
           + chunk(b"IDAT", zlib.compress(b"\x00" * 5)))
    with _pytest.raises(ValueError):
        parse_png(bad)
    # PNG with a truncated (undecompressable) IDAT stream
    good = write_png(4, 4, bytes(range(48)), channels=3)
    with _pytest.raises(Exception):
        parse_png(good[:len(good) - 20])
    with _pytest.raises(ValueError):
        parse_png(b"")
    with _pytest.raises(ValueError):
        parse_jpeg(b"")
    # JPEG with the scan cut mid-block
    j = write_jpeg(16, 16, np.arange(256, dtype=np.uint8).tobytes())
    with _pytest.raises(ValueError):
        parse_jpeg(j[:len(j) // 2])


def test_decode_media_handles_png_alongside_ppm_wav(spark):
    """decode_media(fake=False) on a batch mixing all three real
    containers: the PNG rows decode to the gradient's exact closed-form
    mean and width/height, next to untouched PPM/WAV rows."""
    from pyspark.sql import functions as F

    from yardstick_spark.llm import (decode_media, synth_media,
                                     synth_png_media)

    docs = spark.range(0, 24).withColumnRenamed("id", "doc_id")
    mixed = synth_png_media(docs).unionByName(synth_media(
        docs.select((F.col("doc_id") + 100).alias("doc_id"))))
    rows = {r["media_id"]: r for r in decode_media(
        mixed, n_features=4, fake=False).collect()}
    assert len(rows) == 48
    r = rows[5]  # png, w=5%13+3=8, h=5%7+2=0? 5%7=5 -> h=7
    assert (r["kind"], r["width"], r["height"]) == ("png", 8, 7)
    n = 8 * 7
    want_sum = sum((p + 5) % 251 for p in range(n)) * 3
    assert round(r["mean_val"] * r["n_samples"] * 255) == want_sum
    assert rows[104]["kind"] == "ppm" and rows[105]["kind"] == "wav"


def test_decode_media_real_path(spark):
    import numpy as np

    from yardstick_spark.llm import decode_media, synth_media

    docs = spark.range(0, 20).withColumnRenamed("id", "doc_id")
    out = decode_media(synth_media(docs), n_features=4, fake=False)
    rows = {r["media_id"]: r for r in out.collect()}
    assert len(rows) == 20
    r = rows[4]  # even -> ppm, 7x6, value 4
    assert (r["kind"], r["width"], r["height"]) == ("ppm", 7, 6)
    assert r["n_samples"] == 7 * 6 * 3
    assert abs(r["mean_val"] - 4 / 255.0) < 1e-9
    assert np.allclose(r["features"], [4 / 255.0] * 4)
    r = rows[5]  # odd -> wav, 15 samples of -495
    assert (r["kind"], r["width"], r["height"]) == ("wav", None, None)
    assert r["n_samples"] == 15
    assert abs(r["mean_val"] - 495 / 32768.0) < 1e-9


def test_resize_media_nearest_neighbor(spark):
    import numpy as np

    from yardstick_spark.llm import parse_ppm, resize_media, write_ppm

    # hand-built 4x2 gradient; NN-resize to 2x3 must index
    # rows [0,0,1] (floor(y2*2/3)) and cols [0,2] (floor(x2*4/2))
    img = np.arange(4 * 2 * 3, dtype=np.uint8).reshape(2, 4, 3)
    media = spark.createDataFrame(
        [(1, "image", bytearray(write_ppm(4, 2, img.tobytes()))),
         (2, "audio", bytearray(b"RIFF-not-ppm"))],
        "media_id BIGINT, media_type STRING, payload BINARY",
    )
    rows = {r["media_id"]: r for r in resize_media(media, 2, 3).collect()}
    w, h, arr = parse_ppm(bytes(rows[1]["payload"]))
    assert (w, h) == (2, 3) == (rows[1]["width"], rows[1]["height"])
    expected = img[np.array([0, 0, 1])[:, None], np.array([0, 2])[None, :], :]
    assert arr.tobytes() == expected.tobytes()
    # non-PPM payloads pass through untouched
    assert bytes(rows[2]["payload"]) == b"RIFF-not-ppm"
    assert rows[2]["width"] is None


def test_asof_matched_row_is_atomic(spark):
    # the matched right row must be taken whole: a NULL in the newest
    # right row is carried as NULL, not skipped for an older row's value
    from yardstick_spark.operators import asof_join

    left = spark.createDataFrame([(1, 10)], "k INT, ts INT")
    right = spark.createDataFrame(
        [(1, 5, 1.0, "x"), (1, 8, None, "y")],
        "k INT, ts INT, a DOUBLE, b STRING",
    )
    row = asof_join(left, right, on="k").collect()[0]
    assert row["a_asof"] is None and row["b_asof"] == "y"

    # unmatched left rows keep NULLs
    left2 = spark.createDataFrame([(2, 10)], "k INT, ts INT")
    row2 = asof_join(left2, right, on="k").collect()[0]
    assert row2["a_asof"] is None and row2["b_asof"] is None


def test_strftime_translates_c_specifiers():
    import pytest as _pytest

    from yardstick_spark.functions.compat import (
        normalize_expr_to_spark,
        strftime_format_to_java,
    )

    assert (normalize_expr_to_spark("strftime(d, '%Y-%m-%d %H:%M:%S')")
            == "date_format(d, 'yyyy-MM-dd HH:mm:ss')")
    # reversed (format, value) overload and literal-text quoting
    assert (normalize_expr_to_spark("strftime('%d of %B', d)")
            == "date_format(d, 'dd'' of ''MMMM')")
    assert strftime_format_to_java("%-d.%-m.%y") == "d.M.yy"
    assert strftime_format_to_java("100%%") == "100%"
    with _pytest.raises(ValueError):
        strftime_format_to_java("%U")  # unsupported week-of-year


def test_streaming_attribution_matches_batch(spark, tmp_path):
    from yardstick_spark.sources import read_table
    from yardstick_spark.streaming import (
        attribution_batch,
        attribution_stream,
        stream_events,
    )

    sf = "/root/testdata/sf0.001"
    q = (
        attribution_stream(stream_events(spark, sf), window_minutes=60)
        .writeStream.format("memory")
        .queryName("attr_test")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_attr"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = sorted(tuple(r) for r in spark.table("attr_test").collect())
    want = sorted(tuple(r) for r in attribution_batch(
        read_table(spark, f"{sf}/events.parquet"), window_minutes=60
    ).collect())
    assert got and got == want


def test_streaming_dedup_matches_batch(spark, tmp_path):
    from pyspark.sql import functions as F

    from yardstick_spark.sources import read_table
    from yardstick_spark.streaming import (
        dedup_batch,
        dedup_stream,
        stream_events,
    )

    sf = "/root/testdata/sf0.001"
    # duplicate every event under a repeated key (event_id % 100) so
    # the stream really has in-watermark repeats to drop
    dup_key = (F.col("event_id") % 100).alias("k")
    stream = dedup_stream(
        stream_events(spark, sf).withColumn("k", dup_key), ["k"]
    ).select("k")
    q = (
        stream.writeStream.format("memory")
        .queryName("dedup_test")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_dd"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(r["k"] for r in spark.table("dedup_test").collect())
    batch = dedup_batch(
        read_table(spark, f"{sf}/events.parquet").withColumn("k", dup_key),
        ["k"],
    )
    assert got == sorted(r["k"] for r in batch.select("k").collect())
    assert got == list(range(100))


def test_range_join_matches_duckdb(spark, events):
    # global maintenance windows (45 min every 3 h) with NO equi key —
    # the bucketized plan must equal DuckDB's native BETWEEN join
    from pyspark.sql import functions as F

    from yardstick_spark.operators import range_join

    win = spark.sql("""
        SELECT w_id, TIMESTAMP'2024-01-01 00:00:00' + w_id * INTERVAL 3 HOUR
                 AS w_start,
               TIMESTAMP'2024-01-01 00:00:00' + w_id * INTERVAL 3 HOUR
                 + INTERVAL 45 MINUTE AS w_end
        FROM (SELECT explode(sequence(0, 79)) AS w_id)
    """)
    got = range_join(
        events.select("event_id", F.col("ts").cast("timestamp").alias("ts")),
        win, "ts", "w_start", "w_end",
    ).select("event_id", "w_id")
    con = duckdb.connect()
    con.sql("CREATE VIEW events AS SELECT * FROM "
            "'/root/testdata/sf0.01/events.parquet'")
    want = con.sql("""
        WITH w AS (SELECT i AS w_id,
            TIMESTAMP '2024-01-01 00:00:00' + i * INTERVAL 3 HOUR AS s,
            TIMESTAMP '2024-01-01 00:00:00' + i * INTERVAL 3 HOUR
              + INTERVAL 45 MINUTE AS e
          FROM range(0, 80) t(i))
        SELECT ev.event_id, w.w_id FROM events ev
        JOIN w ON ev.ts BETWEEN w.s AND w.e
    """).fetchall()
    assert sorted(map(tuple, got.collect())) == sorted(want)
    assert want, "windows must actually match some events"
    # plan shape: equi-join on the bucket, not a nested loop
    from yardstick_spark.plans import explain_str

    plan = explain_str(range_join(
        events.select("event_id", F.col("ts").cast("timestamp").alias("ts")),
        win, "ts", "w_start", "w_end"))
    assert "BroadcastNestedLoopJoin" not in plan


def test_rollup_hierarchy_reaggregation_identity(spark, events):
    # daily derived from hourly must equal daily computed from raw;
    # counts and cent-sums are algebraic so the identity is exact
    from yardstick_spark.operators import rollup_events, rollup_hierarchy

    levels = rollup_hierarchy(events, ("hour", "day"))
    derived = sorted(map(tuple, levels["day"].collect()))
    direct = sorted(map(tuple, rollup_events(events, "day").collect()))
    assert derived == direct and derived
    # hour level is strictly finer
    assert levels["hour"].count() > levels["day"].count()


def test_streaming_watermark_drops_late_rows(spark, tmp_path):
    # append-mode tumbling windows must drop rows arriving after the
    # watermark has passed their window: feed two micro-batches — the
    # second contains an event far older than (max ts - watermark) —
    # and assert its window never reaches the sink
    import time

    from pyspark.sql import functions as F

    from yardstick_spark.streaming import tumbling_counts_stream

    src = tmp_path / "late_src"
    src.mkdir()
    on_time = spark.createDataFrame(
        [("click", "2024-01-01 10:05:00", 1.0),
         ("click", "2024-01-01 12:05:00", 1.0)],
        "event_type string, ts_s string, value double",
    ).select("event_type", F.col("ts_s").cast("timestamp").alias("ts"),
             "value")
    late = spark.createDataFrame(
        [("late", "2024-01-01 08:05:00", 1.0)],  # 4 h behind max ts
        "event_type string, ts_s string, value double",
    ).select("event_type", F.col("ts_s").cast("timestamp").alias("ts"),
             "value")
    # one file so both on-time rows form batch 0 together — two part
    # files with tied mtimes could otherwise be picked up in either
    # order, letting the 12:05 file advance the watermark past 10:05
    on_time.coalesce(1).write.parquet(str(src / "b0"))

    stream = (
        spark.readStream.schema(on_time.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src) + "/*")
    )
    out = tumbling_counts_stream(stream, minutes=60, watermark="1 hour")
    q = (
        out.writeStream.format("memory").queryName("late_test")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_late"))
        .start()
    )
    try:
        # let batch 0 advance the watermark to 11:05, then add the
        # 08:05 event — its 08:00 window closed long before
        deadline = time.time() + 60
        while q.lastProgress is None and time.time() < deadline:
            time.sleep(0.5)
        late.write.parquet(str(src / "b1"))
        deadline = time.time() + 60
        while time.time() < deadline:
            p = q.lastProgress
            if p and p["numInputRows"] == 0 and q.status["isTriggerActive"] is False:
                break
            time.sleep(0.5)
        q.processAllAvailable()
    finally:
        q.stop()
    types = {r["event_type"] for r in spark.table("late_test").collect()}
    # the 10:00 window closed when the watermark reached 11:05, so the
    # on-time rows DID emit — an empty sink can't mask the late-drop
    assert "click" in types, "closed on-time window must have emitted"
    assert "late" not in types, "row behind the watermark must be dropped"


def test_resize_media_png_and_jpeg_passthrough(spark):
    """resize_media on a PNG payload inflates, NN-resamples with the
    same index map as the PPM path, and re-encodes as PNG; JPEG
    payloads pass through unchanged (a lossy format would re-quantize
    on re-encode)."""
    import numpy as np

    from yardstick_spark.llm import (parse_png, resize_media,
                                     write_jpeg, write_png)

    img = np.arange(4 * 2 * 3, dtype=np.uint8).reshape(2, 4, 3)
    jpg = write_jpeg(8, 8, bytes(range(64)))
    media = spark.createDataFrame(
        [(1, "image", bytearray(write_png(4, 2, img.tobytes(),
                                          channels=3, filters=2))),
         (2, "image", bytearray(jpg))],
        "media_id BIGINT, media_type STRING, payload BINARY",
    )
    rows = {r["media_id"]: r
            for r in resize_media(media, 2, 3).collect()}
    w, h, ch, arr = parse_png(bytes(rows[1]["payload"]))
    assert (w, h, ch) == (2, 3, 3) \
        == (rows[1]["width"], rows[1]["height"], 3)
    expected = img[np.array([0, 0, 1])[:, None],
                   np.array([0, 2])[None, :], :]
    assert arr.tobytes() == expected.tobytes()
    assert bytes(rows[2]["payload"]) == jpg  # lossy: pass-through
    assert rows[2]["width"] is None


def test_media_stats_known_values(spark):
    # hand-built payloads: a 2x1 PPM with pixels (0, 255) per channel
    # and a 4-sample WAV crossing zero twice
    import numpy as np

    from yardstick_spark.llm import media_stats, write_ppm, write_wav

    img = write_ppm(2, 1, bytes([0, 0, 0, 255, 255, 255]))
    wav = write_wav(np.array([100, -100, 50, -50], dtype="<i2"))
    media = spark.createDataFrame(
        [(1, "image", bytearray(img)), (2, "audio", bytearray(wav)),
         (3, "video", bytearray(b"notacontainer"))],
        "media_id BIGINT, media_type STRING, payload BINARY",
    )
    rows = {r["media_id"]: r for r in media_stats(media).collect()}
    i = rows[1]
    assert (i["kind"], i["n_samples"]) == ("ppm", 6)
    assert i["mean_val"] == 0.5 and i["min_val"] == 0.0 and i["max_val"] == 1.0
    assert i["rms"] == round((0.5) ** 0.5, 6)
    a = rows[2]
    assert (a["kind"], a["n_samples"]) == ("wav", 4)
    assert a["zcr"] == 1.0  # every adjacent pair flips sign
    r = rows[3]
    assert r["kind"] == "raw" and r["mean_val"] is None


def test_funnel_monotone_and_ordered(spark):
    from yardstick_spark.operators import funnel_counts, retention_cohorts

    ev = spark.createDataFrame(
        [
            (1, "signup", "2024-01-01 10:00:00"),
            (1, "view", "2024-01-01 11:00:00"),
            (1, "click", "2024-01-01 12:00:00"),
            (2, "signup", "2024-01-02 10:00:00"),
            (2, "view", "2024-01-02 09:00:00"),  # view BEFORE signup: no
            (3, "view", "2024-01-03 10:00:00"),  # never signed up
        ],
        "user_id BIGINT, event_type STRING, ts_s STRING",
    ).selectExpr("user_id", "event_type", "CAST(ts_s AS TIMESTAMP) AS ts")
    rows = {r["stage"]: r["n"] for r in
            funnel_counts(ev, ["signup", "view", "click"]).collect()}
    assert rows == {"signup": 2, "view": 1, "click": 1}
    ret = {(r["cohort_day"], r["day_offset"]): r["n_users"]
           for r in retention_cohorts(ev).collect()}
    assert ret[("2024-01-01", 0)] == 1
    assert ret[("2024-01-02", 0)] == 1
    assert ret[("2024-01-03", 0)] == 1


def test_event_transitions_known_matrix(spark):
    from yardstick_spark.operators import event_transitions

    rows = [
        # user 1: a -> b -> a ; user 2: a -> b ; user 3: b (no pair)
        (1, 1, "2024-01-01 00:00:00", "a"),
        (2, 1, "2024-01-01 00:01:00", "b"),
        (3, 1, "2024-01-01 00:02:00", "a"),
        (4, 2, "2024-01-01 00:00:00", "a"),
        (5, 2, "2024-01-01 00:01:00", "b"),
        (6, 3, "2024-01-01 00:00:00", "b"),
    ]
    ev = spark.createDataFrame(
        rows, "event_id bigint, user_id bigint, ts string, event_type string"
    ).selectExpr("event_id", "user_id",
                 "CAST(ts AS TIMESTAMP) AS ts", "event_type")
    got = {(r["from_type"], r["to_type"]): (r["n"], r["p"])
           for r in event_transitions(ev).collect()}
    assert got == {("a", "b"): (2, 1.0), ("b", "a"): (1, 1.0)}


def test_daily_anomalies_flags_spike(spark):
    from pyspark.sql import functions as F

    from yardstick_spark.operators import daily_anomalies

    # type x: 10 events/day for 9 days, 100 on day 10 -> day-10 z >> 2;
    # type y: constant -> z = 0 everywhere (stddev 0 guard)
    rows = []
    eid = 0
    for d in range(1, 10):
        for _ in range(10):
            rows.append((eid, f"2024-01-{d:02d} 12:00:00", "x")); eid += 1
    for _ in range(100):
        rows.append((eid, "2024-01-10 12:00:00", "x")); eid += 1
    for d in range(1, 11):
        for _ in range(5):
            rows.append((eid, f"2024-01-{d:02d} 12:00:00", "y")); eid += 1
    ev = spark.createDataFrame(
        rows, "event_id bigint, ts string, event_type string"
    ).withColumn("ts", F.expr("CAST(ts AS TIMESTAMP)"))
    out = {(r["event_type"], r["day"]): r
           for r in daily_anomalies(ev).collect()}
    assert out[("x", "2024-01-10")]["is_anomaly"] is True
    assert out[("x", "2024-01-10")]["z"] > 2.5
    assert all(not v["is_anomaly"] for (t, _), v in out.items() if t == "y")
    assert all(v["z"] == 0.0 for (t, _), v in out.items() if t == "y")
    # the nine normal x days sit below the spike's pull, not flagged
    assert all(not out[("x", f"2024-01-{d:02d}")]["is_anomaly"]
               for d in range(1, 10))


def test_profile_table_single_scan_and_nulls(spark):
    from yardstick_spark.operators import profile_table
    from yardstick_spark.plans import read_schema_columns

    df = spark.createDataFrame(
        [(1, "a"), (2, None), (3, "b"), (None, None)],
        "k BIGINT, s STRING",
    )
    prof = profile_table(df)
    rows = {(r["column_name"], r["metric"]): r["value"]
            for r in prof.collect()}
    assert rows[("k", "n_rows")] == "4"
    assert rows[("k", "n_null")] == "1" and rows[("s", "n_null")] == "2"
    assert rows[("k", "n_distinct")] == "3"
    assert rows[("s", "min")] == "a" and rows[("s", "max")] == "b"
    # all-null column renders 'NULL', never a NULL row
    allnull = spark.createDataFrame([(None,), (None,)], "x STRING")
    rows = {(r["column_name"], r["metric"]): r["value"]
            for r in profile_table(allnull).collect()}
    assert rows[("x", "min")] == "NULL" and rows[("x", "max")] == "NULL"
    # plan shape: exactly TWO pruned scans regardless of column count
    # (base metrics + the (column, value) pair expand feeding ONE
    # two-phase distinct aggregate) — never k per-column jobs and
    # never Spark's (k+1)x multi-distinct Expand
    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    prof = profile_table(li, ["l_orderkey", "l_quantity"])
    scans = read_schema_columns(prof)
    assert len(scans) == 2
    assert sorted(map(tuple, scans)) == [
        ("l_orderkey", "l_quantity"), ("l_orderkey", "l_quantity")]
    from yardstick_spark.plans import explain_str

    assert "Expand" not in explain_str(prof)


def test_numeric_histogram_edges_and_clamp(spark):
    import pytest

    from yardstick_spark.operators import numeric_histogram

    df = spark.createDataFrame(
        [(-5.0,), (0.0,), (4.9,), (5.0,), (9.9,), (10.0,), (25.0,), (None,)],
        "x DOUBLE",
    )
    out = {r["bucket"]: r for r in
           numeric_histogram(df, "x", 2, 0.0, 10.0).collect()}
    # bucket 0 = [0,5): 0.0, 4.9, plus -5 clamped -> 3
    assert out[0]["n"] == 3 and out[0]["lo"] == 0.0 and out[0]["hi"] == 5.0
    # bucket 1 = [5,10]: 5.0, 9.9, 10.0 folded, 25 clamped -> 4
    assert out[1]["n"] == 4
    assert sum(r["n"] for r in out.values()) == 7  # NULL excluded
    with pytest.raises(ValueError):
        numeric_histogram(df, "x", 0, 0.0, 10.0)
    with pytest.raises(ValueError):
        numeric_histogram(df, "x", 4, 10.0, 10.0)


def test_scd2_merge_invariants(spark):
    import pytest
    from pyspark.sql.utils import PythonException

    from yardstick_spark.operators import cdc_compact, scd2_merge

    dim = spark.createDataFrame(
        [(1, "NY", "2020-01-01", None, True),
         (1, "LA", "2019-01-01", "2020-01-01", False),
         (2, "SF", "2020-01-01", None, True)],
        "k INT, city STRING, valid_from STRING, valid_to STRING, "
        "is_current BOOLEAN")
    upd = spark.createDataFrame(
        [(1, "CHI", "2021-06-01"), (2, "SF", "2021-06-01"),
         (4, "DC", "2021-06-01")],
        "k INT, city STRING, ts STRING")
    out = scd2_merge(dim, upd, ["k"], ["city"], "ts")
    rows = sorted((r.k, r.city, r.valid_from, r.valid_to, r.is_current)
                  for r in out.collect())
    assert rows == [
        (1, "CHI", "2021-06-01", None, True),
        (1, "LA", "2019-01-01", "2020-01-01", False),  # history intact
        (1, "NY", "2020-01-01", "2021-06-01", False),  # closed
        (2, "SF", "2020-01-01", None, True),           # no-op
        (4, "DC", "2021-06-01", None, True),           # insert
    ]
    # exactly one current row per key; closed intervals are contiguous
    cur = [r for r in rows if r[4]]
    assert len({r[0] for r in cur}) == len(cur) == 3
    # applying the SAME batch again is a no-op (merge is idempotent)
    again = scd2_merge(out, upd, ["k"], ["city"], "ts")
    assert sorted((r.k, r.city, r.valid_from, r.valid_to, r.is_current)
                  for r in again.collect()) == rows
    # duplicate update keys are rejected, not silently duplicated
    dup = upd.unionAll(spark.createDataFrame(
        [(1, "BOS", "2021-07-01")], "k INT, city STRING, ts STRING"))
    with pytest.raises(Exception, match="cdc_compact"):
        scd2_merge(dim, dup, ["k"], ["city"], "ts").collect()
    # ...and cdc_compact is exactly the fix
    fixed = scd2_merge(dim, cdc_compact(dup, ["k"], "ts"),
                       ["k"], ["city"], "ts")
    cur2 = {(r.k, r.city) for r in fixed.collect() if r.is_current}
    assert (1, "BOS") in cur2


def test_scd2_merge_null_keys_are_real(spark):
    """NULL key components are real matching values (the join is
    eqNullSafe) — presence must come from literal side flags, not
    key-isNotNull, or NULL-keyed rows silently vanish from the merge
    (the round-5 advice finding: kept/closed/inserted all missed
    them)."""
    from yardstick_spark.operators import scd2_merge

    dim = spark.createDataFrame(
        [(None, "NY", "2020-01-01", None, True),
         (2, "SF", "2020-01-01", None, True)],
        "k INT, city STRING, valid_from STRING, valid_to STRING, "
        "is_current BOOLEAN")
    # NULL-key update changes the NULL-key current row; a second
    # NULL-tracked-value update on key 2 must also survive
    upd = spark.createDataFrame(
        [(None, "CHI", "2021-06-01"), (2, None, "2021-06-01")],
        "k INT, city STRING, ts STRING")
    rows = sorted(
        ((r.k, r.city, r.valid_from, r.valid_to, r.is_current)
         for r in scd2_merge(dim, upd, ["k"], ["city"], "ts").collect()),
        key=str)
    assert rows == sorted([
        (None, "NY", "2020-01-01", "2021-06-01", False),  # closed
        (None, "CHI", "2021-06-01", None, True),          # new version
        (2, "SF", "2020-01-01", "2021-06-01", False),
        (2, None, "2021-06-01", None, True),
    ], key=str)
    # untouched NULL-key current row passes through when no update hits
    out2 = scd2_merge(dim, spark.createDataFrame(
        [(7, "DC", "2021-06-01")], "k INT, city STRING, ts STRING"),
        ["k"], ["city"], "ts")
    got = {(r.k, r.city) for r in out2.collect() if r.is_current}
    assert got == {(None, "NY"), (2, "SF"), (7, "DC")}


def test_scd2_lookup_point_in_time(spark):
    from yardstick_spark.operators import scd2_lookup

    dim = spark.createDataFrame(
        [(1, "LA", "2019-01-01", "2020-01-01", False),
         (1, "NY", "2020-01-01", None, True),
         (2, "SF", "2020-01-01", None, True)],
        "k INT, city STRING, valid_from STRING, valid_to STRING, "
        "is_current BOOLEAN")
    facts = spark.createDataFrame(
        [(100, 1, "2019-06-01"), (101, 1, "2021-01-01"),
         (102, 2, "2019-01-01"),   # before any version
         (103, 3, "2021-01-01")],  # unknown key
        "fid INT, k INT, ts STRING")
    left = {r["fid"]: r["city"]
            for r in scd2_lookup(facts, dim, ["k"], "ts").collect()}
    # each fact sees the version valid at ITS OWN ts, never the
    # current one (fid 100 must read LA, not NY)
    assert left == {100: "LA", 101: "NY", 102: None, 103: None}
    inner = {r["fid"]: r["city"] for r in
             scd2_lookup(facts, dim, ["k"], "ts", how="inner").collect()}
    assert inner == {100: "LA", 101: "NY"}
    # boundary semantics: valid_from inclusive, valid_to exclusive
    edge = spark.createDataFrame(
        [(200, 1, "2020-01-01")], "fid INT, k INT, ts STRING")
    assert scd2_lookup(edge, dim, ["k"], "ts").collect()[0]["city"] == "NY"


def test_check_expectations_counts_and_gate(spark):
    from yardstick_spark.operators import (
        check_expectations, in_range, in_set, matches, not_null,
        ref_integrity, satisfies, unique)

    df = spark.createDataFrame(
        [(1, 10.0, "A", "x-1"), (2, None, "A", "x-2"),
         (3, 99.0, "Z", "y-3"), (3, 5.0, "B", "x-4"),
         (None, 5.0, "B", "x-5")],
        "k INT, v DOUBLE, flag STRING, code STRING")
    ref = spark.createDataFrame([(1,), (2,), (3,)], "rk INT")
    out = check_expectations(df, [
        not_null("k"),
        in_range("v", 0, 50),          # NULL v fails, 99 fails -> 2
        in_set("flag", ["A", "B"]),    # Z fails -> 1
        matches("code", "^x-"),        # y-3 fails -> 1
        satisfies("k_positive", "k > 0"),  # NULL k fails -> 1
        unique(["k"]),                 # two k=3 rows -> 2 failed
        ref_integrity("k", ref, "rk"),  # all non-null k present -> 0
    ])
    got = {r.rule: (r.total, r.failed, r.ok) for r in out.collect()}
    assert got["not_null(k)"] == (5, 1, False)
    assert got["in_range(v,0,50)"] == (5, 2, False)
    assert got["in_set(flag)"] == (5, 1, False)
    assert got["matches(code)"] == (5, 1, False)
    assert got["satisfies(k_positive)"] == (5, 1, False)
    assert got["unique(k)"] == (5, 2, False)
    assert got["ref_integrity(k->ref.rk)"] == (4, 0, True)
    # pass_fraction is failed-complement on the rule's own denominator
    fr = {r.rule: r.pass_fraction for r in out.collect()}
    assert fr["in_range(v,0,50)"] == 0.6
    assert fr["ref_integrity(k->ref.rk)"] == 1.0
    # the batch gate: all row-level rules green on a clean slice
    clean = df.filter("k IS NOT NULL AND v IS NOT NULL AND v <= 50 "
                      "AND flag IN ('A','B') AND code LIKE 'x-%'")
    gate = check_expectations(clean, [
        not_null("k"), in_range("v", 0, 50), in_set("flag", ["A", "B"]),
    ])
    assert gate.filter("NOT ok").isEmpty()


def test_check_expectations_single_scan_for_row_rules(spark):
    # all row-level rules must share ONE aggregation over ONE scan:
    # the physical plan has exactly one table scan and no join/shuffle
    # beyond the final single-partition reduce
    from yardstick_spark.operators import (
        check_expectations, in_range, not_null, satisfies)

    df = spark.range(1000).selectExpr("id AS k", "id * 2.0 AS v")
    out = check_expectations(df, [
        not_null("k"), in_range("v", 0, 5000),
        satisfies("even", "v % 2 = 0"), in_range("k", 0, 999),
    ])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Range (") == 1  # exactly one source scan
    assert "partial_sum" in plan       # map-side combined
    assert "Join" not in plan
    # the only exchange is the final 1-row reduce
    assert plan.count("Exchange") == plan.count("Exchange SinglePartition")


def test_heavy_hitters_exact_and_gated(spark):
    import pytest

    from yardstick_spark.operators import heavy_hitters

    # zipf-ish: term_i appears ~ 3000/i times, spread over 8 partitions
    df = spark.range(0, 12000, 1, 8).selectExpr(
        "concat('t', cast(cast(12000 / (id + 1) as int) as string)) "
        "AS term")
    got = [(r.term, r.n) for r in
           heavy_hitters(df, "term", k=10, capacity=64).collect()]
    want = [(r.term, r.n) for r in
            df.groupBy("term").count().selectExpr("term", "count AS n")
            .orderBy("n", ascending=False).orderBy(
                [F.desc("n"), F.asc("term")]).limit(10).collect()]
    assert got == want
    # sketch too small to certify on a flat distribution -> explicit
    # error with the remedy, never a silently-approximate answer
    flat = spark.range(0, 10000, 1, 8).selectExpr(
        "cast(id % 5000 as string) AS term")
    with pytest.raises(ValueError, match="capacity"):
        heavy_hitters(flat, "term", k=3, capacity=8).collect()
    # ...and a big enough sketch certifies even there
    ok = heavy_hitters(flat, "term", k=3, capacity=6000).collect()
    assert [r.n for r in ok] == [2, 2, 2]
    # empty input
    assert heavy_hitters(df.filter("1=0"), "term", k=5).count() == 0


def test_incremental_agg_merge_equals_recompute(spark):
    from yardstick_spark.operators import incremental_agg_merge
    from yardstick_spark.sources import read_table

    li = read_table(spark, f"{SF_DIR}/lineitem.parquet").selectExpr(
        "l_returnflag AS rf", "l_quantity AS q",
        "YEAR(l_shipdate) AS y")
    old = (li.filter("y < 1998").groupBy("rf")
           .agg(F.sum("q").alias("q"), F.count(F.lit(1)).alias("cnt")))
    merged = incremental_agg_merge(old, li.filter("y >= 1998"),
                                   ["rf"], ["q"])
    want = (li.groupBy("rf")
            .agg(F.sum("q").alias("q"), F.count(F.lit(1)).alias("cnt")))
    got = {(r.rf): (round(r.q, 6), r.cnt) for r in merged.collect()}
    exp = {(r.rf): (round(r.q, 6), r.cnt) for r in want.collect()}
    assert got == exp
    # a delta whose keys are all-new creates groups; weighted
    # retraction of EVERYTHING in a group drops it entirely
    import pyspark.sql.functions as SF
    newrows = spark.createDataFrame(
        [("Z", 5.0, 1), ("Z", 7.0, 1)], "rf STRING, q DOUBLE, w INT")
    step1 = incremental_agg_merge(old, newrows, ["rf"], ["q"],
                                  weight_col="w")
    assert {r.rf: (r.q, r.cnt) for r in step1.collect()}["Z"] == (12.0, 2)
    retract = newrows.withColumn("w", SF.lit(-1))
    step2 = incremental_agg_merge(step1, retract, ["rf"], ["q"],
                                  weight_col="w")
    assert "Z" not in {r.rf for r in step2.collect()}
    # the surviving groups are untouched by the Z churn
    assert ({r.rf: r.cnt for r in step2.collect()} ==
            {r.rf: r.cnt for r in old.collect()})


def test_table_diff_classifies_and_filters_unchanged(spark):
    from yardstick_spark.operators import table_diff

    old = spark.createDataFrame(
        [(1, "a", 10), (2, "b", None), (3, "c", 30), (4, "d", 40)],
        "k INT, s STRING, v INT")
    new = spark.createDataFrame(
        [(1, "a", 10),          # unchanged -> absent from diff
         (2, "b", 20),          # NULL -> value is an update
         (3, None, 30),         # value -> NULL is an update
         (5, "e", 50)],         # insert; 4 deleted
        "k INT, s STRING, v INT")
    got = {r.k: r.change for r in table_diff(old, new, ["k"]).collect()}
    assert got == {2: "U", 3: "U", 4: "D", 5: "I"}
    # compare_cols restricts sensitivity: diff on s only ignores v
    got_s = {r.k: r.change
             for r in table_diff(old, new, ["k"],
                                 compare_cols=["s"]).collect()}
    assert got_s == {3: "U", 4: "D", 5: "I"}


def test_check_expectations_empty_input_vacuous_pass(spark):
    from yardstick_spark.operators import (
        check_expectations, in_range, not_null, unique)

    df = spark.createDataFrame([], "k INT, v DOUBLE")
    out = check_expectations(df, [
        not_null("k"), in_range("v", 0, 1), unique(["k"]),
    ]).collect()
    assert all(r.failed == 0 and r.ok for r in out)
    assert all(r.total == 0 for r in out)


def test_gap_fill_daily_zero_and_locf(spark):
    import datetime as dt

    from yardstick_spark.operators import gap_fill_daily

    daily = spark.createDataFrame(
        [("a", dt.date(2024, 1, 1), 2, 10.0),
         ("a", dt.date(2024, 1, 4), 1, 40.0),   # 2 missing days
         ("b", dt.date(2024, 1, 2), 5, 7.5)],   # single-day key
        "k STRING, day DATE, n LONG, level DOUBLE")
    out = gap_fill_daily(daily, ["k"], "day",
                         zero_cols=["n"], locf_cols=["level"])
    rows = {(r.k, str(r.day)): (r.n, r.level, r.is_filled)
            for r in out.collect()}
    assert len(rows) == 5  # a: 4 days, b: 1 day
    assert rows[("a", "2024-01-01")] == (2, 10.0, False)
    assert rows[("a", "2024-01-02")] == (0, 10.0, True)   # locf holds
    assert rows[("a", "2024-01-03")] == (0, 10.0, True)
    assert rows[("a", "2024-01-04")] == (1, 40.0, False)
    assert rows[("b", "2024-01-02")] == (5, 7.5, False)


def test_asof_join_directions_and_tolerance(spark):
    import datetime as dt

    from yardstick_spark.operators import asof_join

    T = dt.datetime
    left = spark.createDataFrame(
        [(1, "u", T(2024, 1, 1, 12, 0)),
         (2, "u", T(2024, 1, 1, 12, 30)),
         (3, "v", T(2024, 1, 1, 9, 0))],  # v: no backward quote
        "id INT, k STRING, ts TIMESTAMP")
    right = spark.createDataFrame(
        [("u", T(2024, 1, 1, 11, 59), 10.0),
         ("u", T(2024, 1, 1, 12, 30), 20.0),   # exact tie with id 2
         ("u", T(2024, 1, 1, 12, 40), 30.0),
         ("v", T(2024, 1, 1, 10, 0), 99.0)],
        "k STRING, ts TIMESTAMP, px DOUBLE")

    def run(**kw):
        return {r.id: r.px_asof
                for r in asof_join(left, right, on="k", **kw).collect()}

    assert run() == {1: 10.0, 2: 20.0, 3: None}  # backward, tie hits
    assert run(direction="forward") == {1: 20.0, 2: 20.0, 3: 99.0}
    # nearest: id1 backward 1min vs forward 30min -> backward;
    # id3 only forward exists
    assert run(direction="nearest") == {1: 10.0, 2: 20.0, 3: 99.0}
    # tolerance voids far matches: id1's quote is 1min old (keeps),
    # id3's nearest is 60min away (voided)
    got = run(direction="nearest", tolerance="INTERVAL 5 MINUTES")
    assert got == {1: 10.0, 2: 20.0, 3: None}


def test_window_distinct_invariants(spark):
    # the first-occurrence-sum rewrite of COUNT(DISTINCT) OVER: cum is
    # non-decreasing and its final value is the true distinct count
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "entry", "/root/repo/__spark_entry__.py")
    e = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(e)
    rows = e.queries()["ops_window_distinct"](
        spark, "/root/testdata/sf0.001").collect()
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    truth = {r.event_type: r.n for r in
             ev.groupBy("event_type")
             .agg(F.countDistinct("user_id").alias("n")).collect()}
    last = {}
    for r in rows:  # already ordered by (event_type, day)
        prev = last.get(r.event_type, 0)
        assert r.cum_users >= prev
        assert r.cum_users >= r.daily_users or prev > 0
        last[r.event_type] = r.cum_users
    assert last == truth


def test_check_expectations_quoted_rule_name(spark):
    from yardstick_spark.operators import check_expectations, satisfies

    df = spark.createDataFrame([(1,)], "k INT")
    out = check_expectations(df, [satisfies("o'brien", "k > 0")])
    r = out.collect()[0]
    assert r.rule == "satisfies(o'brien)" and r.ok


def test_incremental_and_diff_null_keys_merge(spark):
    from yardstick_spark.operators import (
        incremental_agg_merge, table_diff)

    agg = spark.createDataFrame(
        [(None, 10.0, 2), ("a", 1.0, 1)], "k STRING, v DOUBLE, cnt LONG")
    delta = spark.createDataFrame(
        [(None, 5.0), ("a", 2.0)], "k STRING, v DOUBLE")
    got = {r.k: (r.v, r.cnt) for r in
           incremental_agg_merge(agg, delta, ["k"], ["v"]).collect()}
    # NULL group key MERGES (GROUP BY semantics), not duplicated
    assert got == {None: (15.0, 3), "a": (3.0, 2)}

    old = spark.createDataFrame([(None, "x"), (1, "y")],
                                "k INT, s STRING")
    new = spark.createDataFrame([(None, "z"), (1, "y")],
                                "k INT, s STRING")
    diff = {(r.k, r.change)
            for r in table_diff(old, new, ["k"]).collect()}
    assert diff == {(None, "U")}  # one update, not an insert+delete


def test_gap_fill_null_key_series(spark):
    import datetime as dt

    from yardstick_spark.operators import gap_fill_daily

    daily = spark.createDataFrame(
        [(None, dt.date(2024, 1, 1), 4, 1.0),
         (None, dt.date(2024, 1, 3), 2, 3.0)],
        "k STRING, day DATE, n LONG, level DOUBLE")
    rows = {str(r.day): (r.n, r.level, r.is_filled)
            for r in gap_fill_daily(daily, ["k"], "day",
                                    zero_cols=["n"],
                                    locf_cols=["level"]).collect()}
    # the NULL-keyed series is ONE series: actuals rejoin, one gap day
    assert rows == {"2024-01-01": (4, 1.0, False),
                    "2024-01-02": (0, 1.0, True),
                    "2024-01-03": (2, 3.0, False)}
