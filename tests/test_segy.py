"""SEG-Y ingest source gates.

The engine's reader (sources/segy.py) is pinned the codec-verification
way: this file carries an INDEPENDENT spec-derived SEG-Y WRITER (EBCDIC
text header, big-endian binary header, trace headers, IBM/IEEE/int
sample encodings — no engine imports in the builder), hand-computed IBM
hexadecimal-float vectors, and end-to-end ingest → store → scan checks.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from mdio_cpp_spark.sources.segy import (
    HeaderField,
    SegyFormatError,
    file_geometry,
    ibm_to_ieee,
    ingest_to_store,
    read_binary_header,
    read_text_header,
    scan_traces,
)

# ---------------------------------------------------- independent writer


def ieee_to_ibm(x: float) -> int:
    """Spec-derived IBM System/360 float encoder (tests-only counterpart
    of the engine's decoder): value = (-1)^s · 0.F₁₆ · 16^(E-64)."""
    if x == 0:
        return 0
    sign = 0x80000000 if x < 0 else 0
    x = abs(x)
    exp = 64
    while x >= 1.0:
        x /= 16.0
        exp += 1
    while x < 1.0 / 16.0:
        x *= 16.0
        exp -= 1
    frac = int(round(x * (1 << 24)))
    if frac == 1 << 24:  # rounding carried into a new hex digit
        frac >>= 4
        exp += 1
    assert 0 <= exp <= 127, "exponent out of IBM range"
    return sign | (exp << 24) | frac


def write_segy(
    path: str,
    samples: np.ndarray,  # (n_traces, ns) float64
    fmt: int = 1,
    headers: dict[int, np.ndarray] | None = None,  # 1-based byte → int32s
    interval_us: int = 2000,
    n_ext_text: int = 0,
    text: str = "C 1 CLIENT spark-graft test fixture",
    endian: str = "big",
) -> None:
    """Write a SEG-Y rev1 file (rev2 when little-endian or a rev2-only
    sample format is requested) straight from the public standard."""
    n, ns = samples.shape
    e = ">" if endian == "big" else "<"
    rev2 = endian == "little" or fmt in (6, 9, 10, 11, 16)
    out = bytearray()
    card = text.ljust(80)[:80]
    txt = (card + " " * 80 * 39)[: 80 * 40]
    out += txt.encode("cp037")  # EBCDIC, the standard's default
    binhdr = bytearray(400)
    struct.pack_into(f"{e}h", binhdr, 16, interval_us)  # 3217-3218
    struct.pack_into(f"{e}h", binhdr, 20, ns)  # 3221-3222
    struct.pack_into(f"{e}h", binhdr, 24, fmt)  # 3225-3226
    if endian == "little":
        # rev2 byte-order mark: 0x01020304 in the file's own order
        struct.pack_into("<I", binhdr, 96, 0x01020304)
    struct.pack_into(f"{e}h", binhdr, 300, 0x0200 if rev2 else 0x0100)
    struct.pack_into(f"{e}h", binhdr, 302, 1)  # fixed-length traces
    struct.pack_into(f"{e}h", binhdr, 304, n_ext_text)
    out += binhdr
    out += b"\x40" * (3200 * n_ext_text)  # extended text headers (blank)
    _np_fmt = {2: "i4", 3: "i2", 5: "f4", 6: "f8", 9: "i8",
               10: "u4", 11: "u2"}
    for t in range(n):
        th = bytearray(240)
        struct.pack_into(f"{e}i", th, 0, t + 1)  # trace sequence in line
        struct.pack_into(f"{e}h", th, 114, ns)  # per-trace nsamples
        struct.pack_into(f"{e}h", th, 116, interval_us)
        for byte1, vals in (headers or {}).items():
            struct.pack_into(f"{e}i", th, byte1 - 1, int(vals[t]))
        out += th
        row = samples[t]
        if fmt == 1:
            assert endian == "big", "IBM floats are big-endian only"
            out += b"".join(struct.pack(">I", ieee_to_ibm(float(v))) for v in row)
        elif fmt == 8:
            out += row.astype("i1").tobytes()
        elif fmt == 16:
            out += row.astype("u1").tobytes()
        elif fmt in _np_fmt:
            out += row.astype(f"{'<' if endian == 'little' else '>'}{_np_fmt[fmt]}").tobytes()
        else:
            raise AssertionError(fmt)
    with open(path, "wb") as f:
        f.write(out)


# --------------------------------------------------------- IBM vectors


def test_ibm_float_hand_vectors():
    """Hand-computed IBM hexadecimal-float vectors (the public worked
    examples): value = (-1)^s · 0.F₁₆ · 16^(E-64)."""
    vecs = {
        0x00000000: 0.0,
        0x41100000: 1.0,  # 0x.1 * 16^1
        0xC1100000: -1.0,
        0x40800000: 0.5,  # 0x.8 * 16^0
        0x41200000: 2.0,
        0x42640000: 100.0,  # 0x.64 * 16^2
        0xC2640000: -100.0,
        0x4276A000: 118.625,  # the standard worked example 0x76.A
        0xC276A000: -118.625,
        0x3F100000: 1.0 / 256.0,  # 0x.1 * 16^-1
        0x7F000000: 0.0,  # zero fraction decodes 0 regardless of exponent
    }
    got = ibm_to_ieee(np.array(sorted(vecs), dtype=np.uint32))
    for u, want in zip(sorted(vecs), got):
        assert got[sorted(vecs).index(u)] == vecs[u], hex(u)
    # differential vs the independent encoder over awkward magnitudes
    vals = [3.0, -7.25, 1e-6, 123456.0, 16777215.0, 0.0001220703125]
    enc = np.array([ieee_to_ibm(v) for v in vals], dtype=np.uint32)
    dec = ibm_to_ieee(enc)
    assert np.allclose(dec, vals, rtol=1e-6)
    # integers < 2^24 are EXACT in IBM format (the gate relies on this)
    ints = np.array([ieee_to_ibm(float(v)) for v in (1, 2, 977, 65535, 1048576)],
                    dtype=np.uint32)
    assert list(ibm_to_ieee(ints)) == [1.0, 2.0, 977.0, 65535.0, 1048576.0]


# ------------------------------------------------------------ file layer


def test_headers_and_geometry(tmp_path):
    path = str(tmp_path / "a.sgy")
    samples = np.arange(12, dtype="f8").reshape(3, 4)
    write_segy(path, samples, fmt=5, n_ext_text=2,
               text="C 1 CLIENT spark-graft test fixture")
    txt = read_text_header(path)
    assert txt.splitlines()[0].startswith("C 1 CLIENT spark-graft")
    hdr = read_binary_header(path)
    assert hdr["samples_per_trace"] == 4
    assert hdr["format"] == 5
    assert hdr["sample_interval_us"] == 2000
    assert hdr["segy_revision"] == 0x0100
    assert hdr["n_extended_text_headers"] == 2
    geo = file_geometry(path)
    assert geo["data_start"] == 3600 + 2 * 3200
    assert geo["trace_bytes"] == 240 + 4 * 4
    assert geo["n_traces"] == 3


def test_geometry_rejects_malformed(tmp_path):
    path = str(tmp_path / "b.sgy")
    write_segy(path, np.zeros((2, 4)), fmt=5)
    with open(path, "ab") as f:
        f.write(b"\x00" * 7)  # ragged tail
    with pytest.raises(SegyFormatError, match="whole number"):
        file_geometry(path)
    path2 = str(tmp_path / "c.sgy")
    write_segy(path2, np.zeros((1, 4)), fmt=5)
    with open(path2, "r+b") as f:
        f.seek(3200 + 24)
        f.write(struct.pack(">h", 4))  # unsupported format code
    with pytest.raises(SegyFormatError, match="format code"):
        file_geometry(path2)
    with open(path2, "r+b") as f:
        f.seek(3200 + 24)
        f.write(struct.pack(">h", 5))
        f.seek(3200 + 304)
        f.write(struct.pack(">h", -1))  # variable ext headers
    with pytest.raises(SegyFormatError, match="variable-count"):
        file_geometry(path2)


# -------------------------------------------------------- distributed scan


@pytest.mark.parametrize("fmt", [1, 2, 3, 5, 8])
def test_scan_traces_all_formats(tmp_path, spark, fmt):
    rng = np.random.RandomState(fmt)
    n, ns = 37, 11
    if fmt == 1:
        vals = rng.randint(-10000, 10000, (n, ns)).astype("f8")
    elif fmt == 2:
        vals = rng.randint(-(2**30), 2**30, (n, ns)).astype("f8")
    elif fmt == 3:
        vals = rng.randint(-32768, 32767, (n, ns)).astype("f8")
    elif fmt == 5:
        vals = rng.randn(n, ns).astype("f4").astype("f8")
    else:
        vals = rng.randint(-128, 127, (n, ns)).astype("f8")
    path = str(tmp_path / f"f{fmt}.sgy")
    il = 100 + np.arange(n) // 8
    write_segy(path, vals, fmt=fmt, headers={189: il})
    df = scan_traces(spark, path,
                     header_fields=[HeaderField("inline", 189)],
                     traces_per_task=10)
    rows = {r["trace"]: r for r in df.collect()}
    assert len(rows) == n
    for t in range(n):
        assert rows[t]["inline"] == il[t]
        assert np.array_equal(np.asarray(rows[t]["samples"]), vals[t]), (fmt, t)


def test_scan_headers_only_and_int16_field(tmp_path, spark):
    path = str(tmp_path / "h.sgy")
    n = 9
    write_segy(path, np.zeros((n, 4)), fmt=5,
               headers={21: np.arange(n) * 3 + 1})
    df = scan_traces(
        spark, path, with_samples=False,
        header_fields=[HeaderField("ensemble", 21),
                       HeaderField("nsamples", 115, "uint16")])
    rows = sorted(df.collect(), key=lambda r: r["trace"])
    assert "samples" not in df.columns
    assert [r["ensemble"] for r in rows] == [t * 3 + 1 for t in range(n)]
    assert all(r["nsamples"] == 4 for r in rows)


# ---------------------------------------------------------------- ingest


def test_ingest_2d_trace_sample(tmp_path, spark):
    from mdio_cpp_spark.sources.zarr_store import ZarrStore
    from tests.spec_zarr_reader import read_zarr_array

    path = str(tmp_path / "i.sgy")
    n, ns = 50, 8
    vals = (np.arange(n * ns, dtype="f8") % 977).reshape(n, ns)
    write_segy(path, vals, fmt=1)
    root = str(tmp_path / "i.zarr")
    rep = ingest_to_store(spark, path, root, var="amp",
                          compressor={"id": "zlib", "level": 1})
    assert rep["shape"] == [n, ns]
    assert np.array_equal(ZarrStore.open(root).read_array("amp"), vals)
    assert np.array_equal(read_zarr_array(root, "amp"), vals)


def test_ingest_poststack3d_cube(tmp_path, spark):
    """The reference's flagship shape (PostStack3D: inline × crossline ×
    sample): traces place by header-value RANK, coordinate arrays stored,
    and a chunk-pruned isel box scans back exactly."""
    from mdio_cpp_spark.model import MdioDataset
    from mdio_cpp_spark.sources.zarr_store import ZarrStore

    path = str(tmp_path / "cube.sgy")
    n_il, n_xl, ns = 6, 5, 7
    n = n_il * n_xl
    il = 10 + 2 * (np.arange(n) // n_xl)  # non-contiguous inline numbers
    xl = 300 + (np.arange(n) % n_xl)
    cube = np.fromfunction(
        lambda i, x, s: i * 1000 + x * 10 + s, (n_il, n_xl, ns))
    vals = cube.reshape(n, ns)
    write_segy(path, vals, fmt=1, headers={189: il, 193: xl})
    root = str(tmp_path / "cube.zarr")
    rep = ingest_to_store(spark, path, root,
                          grid_by=("inline", "crossline"))
    assert rep["shape"] == [n_il, n_xl, ns]
    st = ZarrStore.open(root)
    assert np.array_equal(st.read_array("amplitude"), cube)
    assert list(st.read_array("inline_coord")) == [10, 12, 14, 16, 18, 20]
    assert list(st.read_array("crossline_coord")) == [300, 301, 302, 303, 304]
    ds = MdioDataset.open(root)
    got = (ds.isel(inline=(1, 4), crossline=(2, 4))
           .to_df(spark, "amplitude", value_col="v").collect())
    assert len(got) == 3 * 2 * ns
    for r in got:
        assert r["v"] == cube[r["inline"], r["crossline"], r["sample"]]


# ---------------------------------------------------------------- export


def test_ieee_to_ibm_engine_matches_independent_encoder():
    """The engine's vectorized export encoder and the tests' scalar
    spec-derived encoder must agree bit-for-bit on every exactly-
    representable value (both emit the normalized canonical form)."""
    from mdio_cpp_spark.sources.segy import ieee_to_ibm as engine_enc

    vals = [0.0, 1.0, -1.0, 0.5, 2.0, 100.0, -100.0, 118.625, -118.625,
            1.0 / 256.0, 977.0, 65535.0, 1048576.0, 3.0, -7.25,
            0.0001220703125, 16777215.0]
    eng = engine_enc(np.array(vals))
    ind = np.array([ieee_to_ibm(v) for v in vals], dtype=np.uint32)
    assert np.array_equal(eng, ind), [hex(a) + "/" + hex(b)
                                      for a, b in zip(eng, ind) if a != b]
    # round-trip closure on inexact magnitudes (decode(encode(x)) ~ x)
    rng = np.random.RandomState(4)
    xs = rng.randn(2000) * np.power(10.0, rng.randint(-8, 8, 2000))
    from mdio_cpp_spark.sources.segy import ibm_to_ieee

    back = ibm_to_ieee(engine_enc(xs))
    assert np.allclose(back, xs, rtol=1e-6)
    with pytest.raises(SegyFormatError, match="NaN/Inf"):
        engine_enc(np.array([1.0, float("nan")]))
    with pytest.raises(SegyFormatError, match="range"):
        engine_enc(np.array([1e80]))
    # underflow flushes to +0
    assert engine_enc(np.array([1e-100]))[0] == 0


def test_export_roundtrip_cube(tmp_path, spark):
    """store → SEG-Y → scan_traces closes the loop: the exported file's
    headers carry the REAL inline/crossline numbers and the samples
    regenerate the cube exactly (IBM-exact integer fixture)."""
    from mdio_cpp_spark.sources.segy import export_segy

    path = str(tmp_path / "cube.sgy")
    n_il, n_xl, ns = 5, 4, 6
    n = n_il * n_xl
    il = 10 + 2 * (np.arange(n) // n_xl)
    xl = 300 + (np.arange(n) % n_xl)
    cube = np.fromfunction(lambda i, x, s: i * 1000 + x * 10 + s,
                           (n_il, n_xl, ns))
    write_segy(path, cube.reshape(n, ns), fmt=1, headers={189: il, 193: xl})
    root = str(tmp_path / "cube.zarr")
    ingest_to_store(spark, path, root, grid_by=("inline", "crossline"))

    out = str(tmp_path / "exported.sgy")
    rep = export_segy(spark, root, "amplitude", out, fmt=1, rows_per_task=2)
    assert rep["n_traces"] == n and rep["samples_per_trace"] == ns
    geo = file_geometry(out)
    assert geo["format"] == 1 and geo["n_traces"] == n
    df = scan_traces(spark, out, header_fields=[
        HeaderField("inline", 189), HeaderField("crossline", 193),
        HeaderField("seq", 1)])
    rows = sorted(df.collect(), key=lambda r: r["trace"])
    for r in rows:
        i, x = (r["inline"] - 10) // 2, r["crossline"] - 300
        assert r["seq"] == r["trace"] + 1
        assert np.array_equal(np.asarray(r["samples"]), cube[i, x]), r["trace"]
    # text header survives the EBCDIC round-trip
    assert read_text_header(out).splitlines()[0].startswith("C 1 exported")


@pytest.mark.parametrize("fmt", [2, 3, 5, 8])
def test_export_formats_2d(tmp_path, spark, fmt):
    """(trace, sample) export in every non-IBM format, re-read by the
    independent scan path."""
    from mdio_cpp_spark.sources.segy import export_segy
    from mdio_cpp_spark.sources.zarr_store import ZarrStore

    n, ns = 13, 5
    lim = {2: 2**30, 3: 30000, 5: 1000, 8: 120}[fmt]
    vals = (np.random.RandomState(fmt).randint(-lim, lim, (n, ns))).astype("f8")
    root = str(tmp_path / "v.zarr")
    st = ZarrStore.create(root, version=2)
    st.create_array("v", shape=(n, ns), chunks=(4, ns), dtype="float64",
                    dims=("trace", "sample"))
    st.consolidate()
    st.write_array_numpy("v", vals)
    out = str(tmp_path / f"v{fmt}.sgy")
    export_segy(spark, root, "v", out, fmt=fmt, rows_per_task=3)
    got = {r["trace"]: np.asarray(r["samples"])
           for r in scan_traces(spark, out).collect()}
    for t in range(n):
        assert np.array_equal(got[t], vals[t]), (fmt, t)


# ------------------------------------------------- DSv2 source (format segy)


def test_segy_datasource_batch_and_sql(tmp_path, spark):
    from mdio_cpp_spark.sources.segy import register_segy

    path = str(tmp_path / "ds.sgy")
    n, ns = 23, 4
    vals = (np.arange(n * ns, dtype="f8") % 91).reshape(n, ns)
    il = 7 + np.arange(n) // 5
    write_segy(path, vals, fmt=1, headers={189: il})
    register_segy(spark)
    df = (spark.read.format("segy").option("path", path)
          .option("header_fields", "inline:189,seq:1").load())
    assert [f.name for f in df.schema.fields] == ["trace", "inline", "seq", "samples"]
    rows = sorted(df.collect(), key=lambda r: r["trace"])
    assert len(rows) == n
    for t in (0, 11, 22):
        assert rows[t]["inline"] == il[t] and rows[t]["seq"] == t + 1
        assert np.array_equal(np.asarray(rows[t]["samples"]), vals[t])
    # SQL over the source + headers-only projection
    df.createOrReplaceTempView("segy_traces")
    got = spark.sql(
        "SELECT inline, COUNT(*) AS n FROM segy_traces GROUP BY inline ORDER BY inline"
    ).collect()
    assert [(r["inline"], r["n"]) for r in got[:2]] == [(7, 5), (8, 5)]
    slim = (spark.read.format("segy").option("path", path)
            .option("with_samples", "false").load())
    assert "samples" not in slim.columns and slim.count() == n


def _append_traces(path, vals_rows, ns):
    """Append whole IBM-format trace records to a growing file."""
    with open(path, "ab") as f:
        for row in vals_rows:
            th = bytearray(240)
            struct.pack_into(">h", th, 114, ns)
            f.write(th)
            f.write(b"".join(struct.pack(">I", ieee_to_ibm(float(v)))
                             for v in row))


def test_segy_stream_tail_exactly_once(tmp_path, spark):
    """readStream.format('segy'): initial drain, then an appended delta
    arrives in the NEXT run without re-emitting old traces (checkpointed
    offset = trace count); a ragged in-flight tail is not read until the
    record completes."""
    from mdio_cpp_spark.sources.segy import register_segy

    register_segy(spark)
    path = str(tmp_path / "grow.sgy")
    ns = 3
    base = np.arange(30, dtype="f8").reshape(10, ns)
    write_segy(path, base, fmt=1)
    ckpt = str(tmp_path / "ckpt")

    def drain():
        got = {}

        def sink(bdf, _bid):
            got.update({r["trace"]: list(r["samples"]) for r in bdf.collect()})

        q = (spark.readStream.format("segy").option("path", path)
             .option("traces_per_task", "4").load()
             .writeStream.foreachBatch(sink)
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination(120)
        return got

    first = drain()
    assert sorted(first) == list(range(10))
    assert first[7] == list(base[7])

    # append 5 whole records + one RAGGED partial record
    delta = np.arange(100, 115, dtype="f8").reshape(5, ns)
    _append_traces(path, delta, ns)
    with open(path, "ab") as f:
        f.write(b"\x00" * 100)  # in-flight partial trace
    second = drain()
    assert sorted(second) == list(range(10, 15))  # delta only, no replay
    assert second[12] == list(delta[2])

    # complete the ragged record -> exactly one more trace appears
    rec_bytes = 240 + ns * 4
    with open(path, "ab") as f:
        f.write(b"\x00" * (rec_bytes - 100))
    third = drain()
    assert sorted(third) == [15]
    assert third[15] == [0.0, 0.0, 0.0]


def test_segy_stream_cap_and_latest(tmp_path, spark):
    from mdio_cpp_spark.sources.segy import SegyStreamReader

    path = str(tmp_path / "cap.sgy")
    ns = 2
    write_segy(path, np.zeros((9, ns)), fmt=5)
    r = SegyStreamReader(path, [], True,
                         {"max_traces_per_trigger": "4"})
    assert r.initialOffset() == {"trace": 0}
    assert r.latestOffset() == {"trace": 4}  # capped
    parts = r.partitions({"trace": 0}, {"trace": 4})
    assert [(p.lo, p.hi) for p in parts] == [(0, 4)]
    r.commit({"trace": 4})
    assert r.latestOffset() == {"trace": 8}
    r.commit({"trace": 8})
    assert r.latestOffset() == {"trace": 9}
    # starting_offset=latest skips the backlog
    r2 = SegyStreamReader(path, [], True, {"starting_offset": "latest"})
    assert r2.initialOffset() == {"trace": 9}


def test_segy_over_memory_scheme(tmp_path, spark):
    """Cloud-path posture: SEG-Y bytes flow through the kvstore seam, so a
    ``memory://`` URL (the fake filesystem the zarr cloud tests use) reads
    through the SAME code the reference exercises against live S3
    (multidimio_compatibility_test.py:53 ingests http/s3 directly).
    Headers, geometry and the driver-side trace parse all run scheme-
    routed; nothing touches os.path."""
    from mdio_cpp_spark.sources.kvstore import open_kvstore
    from mdio_cpp_spark.sources.segy import (_read_trace_range,
                                             file_geometry)

    local = str(tmp_path / "m.sgy")
    vals = (np.arange(24, dtype="f8") % 7).reshape(6, 4)
    write_segy(local, vals, fmt=5, headers={189: 50 + np.arange(6)})
    with open(local, "rb") as f:
        blob = f.read()
    kv = open_kvstore("memory://segybkt")
    kv.write("survey.sgy", blob)
    url = "memory://segybkt/survey.sgy"

    assert read_text_header(url).splitlines()[0].startswith("C 1 CLIENT")
    hdr = read_binary_header(url)
    assert hdr["samples_per_trace"] == 4 and hdr["format"] == 5
    geo = file_geometry(url)
    assert geo["n_traces"] == 6
    pdf = _read_trace_range(url, 1, 4, geo["trace_bytes"],
                            geo["data_start"],
                            [HeaderField("inline", 189)], 5, True)
    assert list(pdf["inline"]) == [51, 52, 53]
    assert np.array_equal(np.stack(pdf["samples"].to_numpy()), vals[1:4])
    # absent object: loud, not silent-empty
    with pytest.raises(SegyFormatError, match="no such file"):
        file_geometry("memory://segybkt/missing.sgy")


def test_ingest_saves_file_headers_and_trace_headers(tmp_path, spark):
    """Reference parity: SAVE_SEGY_FILE_HEADER behavior — the ingested
    store carries the textual + binary file headers as attrs, and (2-D
    path) declared trace headers land as a struct array on the trace
    grid (the HeaderVariable shape)."""
    from mdio_cpp_spark.sources.zarr_store import ZarrStore

    path = str(tmp_path / "hh.sgy")
    n, ns = 18, 4
    vals = np.arange(n * ns, dtype="f8").reshape(n, ns)
    il = 40 + np.arange(n) // 6
    write_segy(path, vals, fmt=1, headers={189: il},
               text="C 1 CLIENT acme CREW 7")
    root = str(tmp_path / "hh.zarr")
    ingest_to_store(spark, path, root, var="amp",
                    header_fields=[HeaderField("inline", 189)])
    st = ZarrStore.open(root)
    assert st.attrs["segy_text_header"].splitlines()[0].startswith(
        "C 1 CLIENT acme CREW 7")
    assert st.attrs["segy_binary_header"]["samples_per_trace"] == ns
    assert st.attrs["segy_binary_header"]["format"] == 1
    hdr = st.read_array("headers")
    assert list(hdr["inline"]) == list(il)
    assert np.array_equal(st.read_array("amp"), vals)
    # the cube path keeps the attrs too
    xl = 300 + np.arange(n) % 6
    path2 = str(tmp_path / "hh2.sgy")
    write_segy(path2, vals, fmt=1, headers={189: il, 193: xl})
    root2 = str(tmp_path / "hh2.zarr")
    ingest_to_store(spark, path2, root2, grid_by=("inline", "crossline"))
    assert "segy_text_header" in ZarrStore.open(root2).attrs


# --------------------------------------------------------- rev2 byte order


def test_rev2_bom_detection(tmp_path):
    import struct as _st

    big = str(tmp_path / "big.sgy")
    write_segy(big, np.arange(8.0).reshape(2, 4), fmt=5)
    assert read_binary_header(big)["endianness"] == "big"

    le = str(tmp_path / "le.sgy")
    write_segy(le, np.arange(8.0).reshape(2, 4), fmt=6, endian="little")
    h = read_binary_header(le)
    assert h["endianness"] == "little"
    assert h["format"] == 6 and h["samples_per_trace"] == 4
    assert h["segy_revision"] == 0x0200

    # pairwise-swapped mark and garbage marks are refused loudly
    raw = bytearray(open(le, "rb").read())
    for bad in (0x02010403, 0xDEADBEEF):
        _st.pack_into(">I", raw, 3200 + 96, bad)
        broken = str(tmp_path / "bad.sgy")
        open(broken, "wb").write(bytes(raw))
        with pytest.raises(SegyFormatError):
            read_binary_header(broken)


def test_rev2_little_endian_scan(tmp_path, spark):
    path = str(tmp_path / "le.sgy")
    vals = np.array([[1.5, -2.25, 3e10, 0.0], [4.0, 5.5, -6.75, 7.125]])
    write_segy(path, vals, fmt=6, endian="little",
               headers={189: np.array([70, 71])})
    df = scan_traces(spark, path,
                     header_fields=[HeaderField("inline", 189)])
    rows = df.orderBy("trace").collect()
    assert [r.inline for r in rows] == [70, 71]
    got = np.array([r.samples for r in rows])
    assert np.array_equal(got, vals)  # float64 is bit-exact through LE


@pytest.mark.parametrize("fmt", [6, 9, 10, 11, 16])
def test_rev2_new_formats_big_endian(tmp_path, spark, fmt):
    path = str(tmp_path / f"f{fmt}.sgy")
    lim = {6: 1e6, 9: 1 << 40, 10: 1 << 31, 11: 60000, 16: 250}[fmt]
    vals = np.array([[0, 1, 2, int(lim)], [3, 4, 5, 6]], dtype=np.float64)
    write_segy(path, vals, fmt=fmt)
    rows = scan_traces(spark, path).orderBy("trace").collect()
    got = np.array([r.samples for r in rows])
    assert np.array_equal(got, vals)


def test_rev2_ibm_little_endian_refused(tmp_path):
    import struct as _st

    path = str(tmp_path / "ibm_le.sgy")
    write_segy(path, np.arange(8.0).reshape(2, 4), fmt=5, endian="little")
    raw = bytearray(open(path, "rb").read())
    _st.pack_into("<h", raw, 3200 + 24, 1)  # claim IBM in an LE file
    open(path, "wb").write(bytes(raw))
    with pytest.raises(SegyFormatError, match="IBM"):
        file_geometry(path)


def test_export_little_endian_roundtrip(tmp_path, spark):
    from mdio_cpp_spark.sources.segy import export_segy, ingest_to_store

    src = str(tmp_path / "src.sgy")
    vals = np.arange(24, dtype=np.float64).reshape(6, 4) * 0.5 - 3.25
    write_segy(src, vals, fmt=5)
    root = str(tmp_path / "cube.zarr")
    ingest_to_store(spark, src, root)

    out = str(tmp_path / "out_le.sgy")
    rep = export_segy(spark, root, "amplitude", out, fmt=6, endian="little")
    assert rep["n_traces"] == 6
    h = read_binary_header(out)
    assert h["endianness"] == "little" and h["segy_revision"] == 0x0200
    got = np.array([r.samples for r in
                    scan_traces(spark, out).orderBy("trace").collect()])
    assert np.array_equal(got, vals)  # f4→f8 widening is exact

    with pytest.raises(SegyFormatError, match="IBM"):
        export_segy(spark, root, "amplitude", out + "x", fmt=1,
                    endian="little")


def test_segy_over_http_distributed_ingest(tmp_path, spark):
    """The reference's signature real-data shape — ingest SEG-Y straight
    from a URL (multidimio_compatibility_test.py:53 pulls Teapot Dome from
    S3) — over REAL network sockets: a loopback HTTP server serves the
    spec-derived fixture, the distributed scan reads it through the
    scheme-routed HttpKVStore (each task one contiguous ranged GET from its
    own Python worker), ingest lands a local store bit-exact, and the
    request log proves no task ever fetched the whole file."""
    from mdio_cpp_spark.sources.http_loopback import LoopbackHttpServer
    from mdio_cpp_spark.sources.segy import file_geometry, ingest_to_store, scan_traces
    from mdio_cpp_spark.sources.zarr_store import ZarrStore
    from tests.spec_zarr_reader import read_zarr_array

    local = str(tmp_path / "h.sgy")
    n, ns = 64, 8
    vals = (np.arange(n * ns, dtype="f8") % 977).reshape(n, ns)
    write_segy(local, vals, fmt=5, headers={189: 100 + np.arange(n)})
    with LoopbackHttpServer(str(tmp_path)) as srv:
        url = f"{srv.url}/h.sgy"
        assert read_text_header(url).splitlines()[0].startswith("C 1 CLIENT")
        geo = file_geometry(url)
        assert geo["n_traces"] == n
        srv.clear_log()
        df = scan_traces(spark, url, [HeaderField("inline", 189)],
                         traces_per_task=16)
        rows = df.orderBy("trace").collect()
        assert [r["inline"] for r in rows] == [100 + t for t in range(n)]
        got = np.array([r["samples"] for r in rows])
        assert np.array_equal(got, vals)
        gets = [r for r in srv.requests if r[0] == "GET"]
        assert gets and all(r[2] is not None for r in gets), \
            f"full-object GET over HTTP: {gets}"
        # distributed ingest from the URL → local store, bit-exact
        root = str(tmp_path / "h.zarr")
        rep = ingest_to_store(spark, url, root, var="amp",
                              compressor={"id": "zlib", "level": 1})
        assert rep["shape"] == [n, ns]
        assert np.array_equal(ZarrStore.open(root).read_array("amp"), vals)
        assert np.array_equal(read_zarr_array(root, "amp"), vals)


def test_segy_stream_tail_over_http(tmp_path, spark):
    """The streaming acquisition tail running against an HTTP endpoint: the
    growing file is served by the loopback server; offsets (trace count)
    come from HEAD probes and each microbatch's traces arrive via ranged
    GETs — the live-acquisition-in-a-bucket shape, exactly-once across
    restarts, no local filesystem access by the reader."""
    from mdio_cpp_spark.sources.http_loopback import LoopbackHttpServer
    from mdio_cpp_spark.sources.segy import register_segy

    register_segy(spark)
    local = str(tmp_path / "grow.sgy")
    ns = 3
    base = np.arange(30, dtype="f8").reshape(10, ns)
    write_segy(local, base, fmt=1)  # _append_traces writes IBM records
    ckpt = str(tmp_path / "ckpt")

    with LoopbackHttpServer(str(tmp_path)) as srv:
        url = f"{srv.url}/grow.sgy"

        def drain():
            got = {}

            def sink(bdf, _bid):
                got.update({r["trace"]: list(r["samples"]) for r in bdf.collect()})

            q = (spark.readStream.format("segy").option("path", url)
                 .option("traces_per_task", "4").load()
                 .writeStream.foreachBatch(sink)
                 .option("checkpointLocation", ckpt)
                 .trigger(availableNow=True).start())
            q.awaitTermination(120)
            return got

        first = drain()
        assert sorted(first) == list(range(10))
        assert first[7] == list(base[7])
        delta = np.arange(100, 115, dtype="f8").reshape(5, ns)
        _append_traces(local, delta, ns)
        second = drain()
        assert sorted(second) == list(range(10, 15))  # delta only, no replay
        assert second[12] == list(delta[2])
        gets = [r for r in srv.requests if r[0] == "GET" and r[1].endswith("grow.sgy")]
        assert gets and all(r[2] is not None for r in gets), \
            "stream reader fetched the whole file"
