"""Charset sniffing + decode goldens (reference:
async_crawler_strategy.py:2331-2336 precedence, utils.py:777-792
sanitize round-trip)."""

import codecs

import pyarrow as pa

from crawl4ai_custom_ray.html.encoding import (
    decode_batch,
    decode_html,
    sanitize_input_encode,
    sniff_encoding,
)


def test_bom_beats_everything():
    data = codecs.BOM_UTF16_LE + "hé".encode("utf-16-le")
    assert sniff_encoding(data, "text/html; charset=latin-1") == "utf-16-le"
    text, enc = decode_html(data)
    assert text == "hé" and enc == "utf-16-le"
    sig = codecs.BOM_UTF8 + "hé".encode("utf-8")
    text, enc = decode_html(sig)
    assert text == "hé" and enc == "utf-8-sig"  # BOM stripped


def test_content_type_charset():
    data = "café".encode("latin-1")
    assert sniff_encoding(data, "text/html; charset=ISO-8859-1") == "iso-8859-1"
    assert decode_html(data, "text/html; charset=ISO-8859-1")[0] == "café"


def test_meta_charset_declaration():
    for meta in (
        b'<meta charset="iso-8859-1">',
        b"<meta charset=iso-8859-1>",
        b'<meta http-equiv="Content-Type" content="text/html; charset=iso-8859-1">',
    ):
        data = b"<html><head>" + meta + b"</head>" + "café".encode("latin-1")
        assert sniff_encoding(data) == "iso-8859-1", meta
    # unknown declared charset falls through to the probe chain
    data = b'<meta charset="not-a-real-charset">' + "ok".encode()
    assert sniff_encoding(data) == "utf-8"


def test_utf8_probe_then_cp1252_fallback():
    assert sniff_encoding("héllo".encode("utf-8")) == "utf-8"
    # 0x93/0x94 are cp1252 smart quotes, invalid standalone utf-8
    data = b"\x93quoted\x94"
    assert sniff_encoding(data) == "cp1252"
    assert decode_html(data)[0] == "“quoted”"


def test_decode_html_degenerate_inputs():
    assert decode_html(None) == ("", "utf-8")
    assert decode_html("already str") == ("already str", "utf-8")
    assert decode_html(b"") == ("", "utf-8")


def test_sanitize_input_encode_reference_parity():
    # reference: encode('utf-8', errors='ignore') round-trip, '' for falsy
    assert sanitize_input_encode("") == ""
    assert sanitize_input_encode("plain") == "plain"
    lone_surrogate = "a\ud800b"
    assert sanitize_input_encode(lone_surrogate) == "ab"


def test_decode_batch_columns():
    batch = pa.table(
        {
            "url": ["u1", "u2"],
            "html": [b"\x93x\x94", "ok".encode("utf-8")],
        }
    )
    out = decode_batch(batch)
    assert out["html_text"].to_pylist() == ["“x”", "ok"]
    assert out["encoding"].to_pylist() == ["cp1252", "utf-8"]
