"""Real-codec proof for the multimodal decode path: binary-PPM (P6)
payloads parsed by an actual netpbm header parser + numpy pixel pass
inside mapInPandas (the image libs aren't in this container, so PPM —
a pure-bytes format — is the honest real-decode choice)."""

import pytest

from orca_spark.operators.multimodal import (
    _parse_ppm_header,
    decode_ppm_images,
)


def _ppm(width: int, height: int, pixels: bytes, header: bytes | None = None) -> bytes:
    head = header if header is not None else f"P6\n{width} {height}\n255\n".encode()
    return head + pixels


def test_ppm_header_parse_variants():
    px = bytes(range(12))
    # canonical
    assert _parse_ppm_header(_ppm(2, 2, px)) == (2, 2, 255, 11)
    # comments + arbitrary whitespace per the netpbm spec
    fancy = b"P6 # comment\n  2\t2 # another\n255\n" + px
    w, h, maxval, off = _parse_ppm_header(fancy)
    assert (w, h, maxval) == (2, 2, 255)
    assert fancy[off : off + 12] == px


@pytest.mark.parametrize(
    "data",
    [
        b"P5\n2 2\n255\n" + bytes(12),     # wrong magic (greyscale)
        b"P6\n2 2\n255\n" + bytes(5),      # truncated pixels
        b"P6\n2 2\n0\n" + bytes(12),       # bad maxval
        b"P6\n2 2",                        # truncated header
    ],
)
def test_ppm_header_parse_rejects_malformed(data):
    with pytest.raises(ValueError):
        _parse_ppm_header(data)


def test_ppm_roundtrip_through_mapinpandas(spark):
    """Generated PPM payloads decode to exact dims and pixel means via
    the Arrow mapInPandas path — the real-bytes round-trip."""
    rows = []
    expect = {}
    for doc_id, (w, h) in enumerate([(2, 2), (4, 3), (1, 1)]):
        px = bytes((doc_id * 7 + i * 13) % 256 for i in range(w * h * 3))
        rows.append((doc_id, _ppm(w, h, px)))
        expect[doc_id] = (w, h, sum(px) / len(px) / 255.0)
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {r.doc_id: r for r in decode_ppm_images(df).collect()}
    assert set(got) == set(expect)
    for doc_id, (w, h, mean) in expect.items():
        r = got[doc_id]
        assert (r.width, r.height, r.n_channels) == (w, h, 3)
        assert abs(r.feature_mean - mean) < 1e-12
        assert r.n_bytes == len(rows[doc_id][1])


@pytest.mark.parametrize(
    "data",
    [
        b"P6\n2 2\n65535\n" + bytes(24),    # 16-bit samples unsupported
        b"P6\n0 0\n255\n",                  # zero dimensions
        b"P6\n-1 2\n255\n" + bytes(12),     # negative width
    ],
)
def test_ppm_header_parse_rejects_unsupported(data):
    with pytest.raises(ValueError):
        _parse_ppm_header(data)


def test_ppm_comment_between_maxval_and_raster():
    """Spec-legal comment before the raster delimiter must not be
    consumed as pixel data."""
    px = bytes(range(12))
    data = b"P6\n2 2\n255#trailing comment\n" + px
    w, h, maxval, off = _parse_ppm_header(data)
    assert (w, h, maxval) == (2, 2, 255)
    assert data[off : off + 12] == px
    # a raster whose first byte is 0x23 ('#') must NOT be eaten as a
    # comment once the delimiter has been consumed
    hash_px = b"#" + bytes(range(11))
    data2 = b"P6\n2 2\n255\n" + hash_px
    _, _, _, off2 = _parse_ppm_header(data2)
    assert data2[off2 : off2 + 12] == hash_px


def test_ppm_crlf_comment_terminator():
    """A Windows-authored (CRLF-terminated) comment after maxval: \r\n
    is ONE delimiter — the \n must not leak into the raster."""
    px = bytes(range(12))
    data = b"P6\r\n2 2\r\n255#written on windows\r\n" + px
    w, h, maxval, off = _parse_ppm_header(data)
    assert (w, h, maxval) == (2, 2, 255)
    assert data[off : off + 12] == px
    # bare-\r terminator (classic Mac) also delimits cleanly
    data_cr = b"P6\n2 2\n255#cr only\r" + px
    _, _, _, off_cr = _parse_ppm_header(data_cr)
    assert data_cr[off_cr : off_cr + 12] == px
    # and a raster that legitimately BEGINS with \n after a CRLF comment
    # still yields the right pixels (the \n is pixel data, not delimiter)
    px_nl = b"\n" + bytes(range(11))
    data3 = b"P6\n2 2\n255#c\r\n" + px_nl
    _, _, _, off3 = _parse_ppm_header(data3)
    assert data3[off3 : off3 + 12] == px_nl


def test_ppm_bare_cr_comment_with_raster_starting_0x0a():
    """Mac-style bare-\r comment whose raster legitimately BEGINS with a
    0x0A byte: the exact raster size disambiguates — the \n is pixel
    data, not the second half of a CRLF."""
    from orca_spark.operators.multimodal import _parse_ppm_header

    px = b"\x0a" + bytes(range(11))  # 2x2x3 = 12 bytes, first is 0x0A
    data = b"P6\n2 2\n255#mac comment\r" + px
    w, h, maxval, off = _parse_ppm_header(data)
    assert (w, h, maxval) == (2, 2, 255)
    assert data[off:] == px  # the 0x0A survived as the first pixel byte
