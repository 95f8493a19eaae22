import io
import zipfile

import pyspark.sql.functions as F
import pytest

from azuredataengineering_deeplearning_spark.operators import graph as G
from azuredataengineering_deeplearning_spark.operators import multimodal as MM


def test_bom_closure_multiplicity(spark):
    # a appears under two parents with different quantities; the closure
    # keeps one row per *path* (generate_data.py:298-307 semantics)
    edges = spark.createDataFrame(
        [("r1", "a", 2), ("r2", "a", 5), ("a", "leaf", 3)],
        "parent string, child string, qty int",
    )
    closure = G.expand_hierarchy(edges, quantity_col="qty").collect()
    rows = {(r.root, r.node, r.level): r.quantity for r in closure}
    assert rows[("r1", "a", 1)] == 2.0
    assert rows[("r2", "a", 1)] == 5.0
    assert rows[("r1", "leaf", 2)] == 6.0   # 2 * 3 along the path
    assert rows[("r2", "leaf", 2)] == 15.0  # 5 * 3
    roll = {r.root: (r.NumBOMParts, r.MaxBOMDepth) for r in
            G.hierarchy_rollups(G.expand_hierarchy(edges)).collect()}
    assert roll["r1"] == (2, 2)


def test_bom_closure_depth_cap(spark):
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(10)], "parent long, child long"
    )
    capped = G.expand_hierarchy(edges, max_depth=3)
    assert capped.agg(F.max("level")).collect()[0][0] == 3


def test_binary_metadata_sniff(spark):
    df = spark.createDataFrame(
        [(1, bytes.fromhex("89504E47") + b"rest"), (2, b"plain"),
         (3, bytes.fromhex("FFD8FFE0") + b"jfif")],
        "id long, blob binary",
    )
    out = {r.id: r.blob_format for r in MM.binary_metadata(df, "blob").collect()}
    assert out == {1: "png", 2: "unknown", 3: "jpeg"}


def test_unzip_members(spark, tmp_path):
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        z.writestr("a.txt", b"hello")
        z.writestr("dir/b.bin", b"\x00\x01\x02")
    (tmp_path / "x.zip").write_bytes(buf.getvalue())
    (tmp_path / "notzip.bin").write_bytes(b"junk")

    files = MM.read_binary_files(spark, str(tmp_path / "*"))
    members = MM.unzip_members(files).collect()
    by = {r.member_name: r for r in members}
    assert by["a.txt"].member_bytes == bytearray(b"hello")
    assert by["dir/b.bin"].member_size == 3
    assert len(members) == 2  # bad zip skipped, dirs skipped


def test_decode_features_plumbing(spark):
    df = spark.createDataFrame(
        [("p1", b"aaaa"), ("p2", b"bbbb")], "path string, content binary"
    )
    feats = MM.decode_features(
        df, "content", "path", decoder=MM.deterministic_fake_decoder(4)
    ).collect()
    assert {r.path for r in feats} == {"p1", "p2"}
    assert all(len(r.features) == 4 for r in feats)
    # deterministic: same input → same features
    again = MM.decode_features(
        df, "content", "path", decoder=MM.deterministic_fake_decoder(4)
    ).collect()
    assert sorted(map(str, feats)) == sorted(map(str, again))


def test_decode_features_stub_contract(spark):
    df = spark.createDataFrame([("p", b"x")], "path string, content binary")
    with pytest.raises(NotImplementedError):
        MM.decode_features(df, "content", "path")


def test_frame_sample_plumbing(spark):
    from azuredataengineering_deeplearning_spark.operators import multimodal as MM

    df = spark.createDataFrame(
        [("v1", b"\x01\x02\x03", 25), ("v2", b"\x04", 3), ("v3", b"", 0)],
        "vid string, content binary, n_frames int",
    )
    out = MM.frame_sample(
        df,
        "content",
        "vid",
        "n_frames",
        every_k=10,
        extractor=MM.deterministic_fake_frame_extractor(),
    )
    rows = out.collect()
    per = {}
    for r in rows:
        per.setdefault(r.vid, []).append(r.frame_index)
        assert isinstance(r.frame, (bytes, bytearray)) and len(r.frame) == 16
    # 25 frames @ every 10 -> indices 0,10,20; 3 frames -> 0; 0 frames -> 0
    assert sorted(per["v1"]) == [0, 10, 20]
    assert per["v2"] == [0] and per["v3"] == [0]
    # deterministic across runs
    again = {(r.vid, r.frame_index): bytes(r.frame) for r in out.collect()}
    assert {(r.vid, r.frame_index): bytes(r.frame) for r in rows} == again
    # stub contract: no extractor -> NotImplementedError at plan build
    import pytest as pt

    with pt.raises(NotImplementedError):
        MM.frame_sample(df, "content", "vid", "n_frames")


def test_image_dimensions_from_headers(spark):
    import struct
    import zlib
    from azuredataengineering_deeplearning_spark.operators import multimodal as MM

    # handcraft a minimal PNG header (signature + IHDR chunk)
    ihdr = struct.pack(">II", 640, 480) + bytes([8, 2, 0, 0, 0])
    png = (
        b"\x89PNG\r\n\x1a\n"
        + struct.pack(">I", 13) + b"IHDR" + ihdr
        + struct.pack(">I", zlib.crc32(b"IHDR" + ihdr))
    )
    # minimal JPEG: SOI + APP0 stub + SOF0 with 8-bit 320x200
    sof0 = b"\xff\xc0" + struct.pack(">H", 11) + bytes([8]) + struct.pack(">HH", 200, 320) + bytes([1, 0x11, 0])
    jpeg = b"\xff\xd8\xff" + b"\xe0" + struct.pack(">H", 4) + b"JF" + sof0
    gif = b"GIF89a" + struct.pack("<HH", 16, 32) + bytes([0xF7, 0, 0])
    junk = b"not an image"
    df = spark.createDataFrame(
        [(1, bytearray(png)), (2, bytearray(jpeg)), (3, bytearray(gif)), (4, bytearray(junk))],
        "id int, blob binary",
    )
    out = {r.id: r for r in MM.image_dimensions(df, "blob").collect()}
    assert (out[1].img_format, out[1].img_width, out[1].img_height, out[1].img_bits) == ("png", 640, 480, 8)
    assert (out[2].img_format, out[2].img_width, out[2].img_height) == ("jpeg", 320, 200)
    assert (out[3].img_format, out[3].img_width, out[3].img_height, out[3].img_bits) == ("gif", 16, 32, 8)
    assert out[4].img_format is None and out[4].img_width is None


def test_audio_metadata_wav_header(spark):
    import struct
    from azuredataengineering_deeplearning_spark.operators import multimodal as MM

    rate, ch, bits, n_samples = 16000, 1, 16, 16000 * 3  # 3 s mono
    data_len = n_samples * ch * bits // 8
    fmt = struct.pack("<HHIIHH", 1, ch, rate, rate * ch * bits // 8, ch * bits // 8, bits)
    wav = (
        b"RIFF" + struct.pack("<I", 36 + data_len) + b"WAVE"
        + b"fmt " + struct.pack("<I", 16) + fmt
        + b"data" + struct.pack("<I", data_len)  # header only, no samples needed
    )
    df = spark.createDataFrame(
        [(1, bytearray(wav)), (2, bytearray(b"zzzz"))], "id int, blob binary"
    )
    out = {r.id: r for r in MM.audio_metadata(df, "blob").collect()}
    r = out[1]
    assert (r.audio_format, r.audio_sample_rate, r.audio_channels, r.audio_bits) == ("wav", 16000, 1, 16)
    assert abs(r.audio_duration_s - 3.0) < 1e-9
    assert out[2].audio_format is None
