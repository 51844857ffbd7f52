"""Naive PDF processor tests: deterministic mini-writer corpus round-
tripped through the stdlib parser, reference-surface checks, and the
Ray actor-pool stage (incl. malformed-input rows)."""

import pytest

from crawl4ai_custom_ray.functions.pdf import (
    NaivePDFProcessorStrategy,
    PdfDocument,
    build_pdf,
    clean_pdf_text,
    process_pdfs,
)


def test_single_page_text_roundtrip(tmp_path):
    data = build_pdf(["Hello PDF world\nsecond line"])
    p = tmp_path / "t.pdf"
    p.write_bytes(data)
    r = NaivePDFProcessorStrategy().process(p)
    assert r.metadata.pages == 1
    assert r.metadata.file_size == len(data)
    assert r.pages[0].raw_text == "Hello PDF world\nsecond line"


def test_multi_page_order_and_metadata():
    data = build_pdf(
        ["page one text here", "page two text here", "page three text here"],
        title="A Title", author="An Author",
        created="D:20230506071234",
    )
    r = NaivePDFProcessorStrategy().process_bytes(data)
    assert [p.page_number for p in r.pages] == [1, 2, 3]
    assert [p.raw_text.split()[1] for p in r.pages] == ["one", "two", "three"]
    m = r.metadata
    assert (m.title, m.author) == ("A Title", "An Author")
    assert (m.created.year, m.created.month, m.created.second) == (2023, 5, 34)
    assert m.encrypted is False


def test_links_and_images():
    data = build_pdf(
        ["with a link", "no links"],
        links=[["https://a.example/x", "https://b.example/y"], []],
    )
    r = NaivePDFProcessorStrategy().process_bytes(data)
    assert r.pages[0].links == ["https://a.example/x", "https://b.example/y"]
    assert r.pages[1].links == []


def test_uncompressed_and_escapes():
    text = "parens (nested (deep)) and back\\slash"
    data = build_pdf([text], compress=False)
    r = NaivePDFProcessorStrategy().process_bytes(data)
    assert r.pages[0].raw_text == text


def test_hex_string_and_tj_array():
    # hand-built content stream exercising <hex> Tj and TJ arrays
    import zlib

    content = b"BT (AB) Tj [(C) -200 (D)] TJ <4546> Tj ET"
    pdf = (
        b"%PDF-1.4\n"
        b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
        b"2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n"
        b"3 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>\nendobj\n"
        b"4 0 obj\n<< /Length " + str(len(content)).encode() + b" >>\nstream\n"
        + content
        + b"\nendstream\nendobj\n"
        b"trailer\n<< /Size 5 /Root 1 0 R >>\n%%EOF\n"
    )
    r = NaivePDFProcessorStrategy().process_bytes(pdf)
    assert r.pages[0].raw_text == "ABC DEF"


def test_length_as_indirect_ref():
    content = b"BT (via ref) Tj ET"
    pdf = (
        b"%PDF-1.4\n"
        b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
        b"2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n"
        b"3 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>\nendobj\n"
        b"4 0 obj\n<< /Length 5 0 R >>\nstream\n"
        + content
        + b"\nendstream\nendobj\n"
        b"5 0 obj\n" + str(len(content)).encode() + b"\nendobj\n"
        b"trailer\n<< /Size 6 /Root 1 0 R >>\n%%EOF\n"
    )
    r = NaivePDFProcessorStrategy().process_bytes(pdf)
    assert r.pages[0].raw_text == "via ref"


def test_utf16_metadata_string():
    title = "Ünïcode Tïtle"
    raw = b"\xfe\xff" + title.encode("utf-16-be")
    # splice a utf-16 title through the escape-free hex route
    pdf = build_pdf(["x"], title="placeholder")
    pdf = pdf.replace(b"(placeholder)", b"<" + raw.hex().encode() + b">")
    r = NaivePDFProcessorStrategy().process_bytes(pdf)
    assert r.metadata.title == title


def test_markdown_title_and_numbered_headers():
    text = "A Short Document Title\nintro paragraph line one\nline two\n\n2.1 Background\nbody text"
    md = clean_pdf_text(1, text)
    assert md.startswith("## A Short Document Title")
    assert "\n\n### Background\n\n" in md
    assert "intro paragraph line one line two" in md


def test_hyphenation_join():
    assert "pipeline" in clean_pdf_text(2, "a pipe-\nline word")


def test_not_a_pdf_raises():
    with pytest.raises(ValueError):
        PdfDocument.from_bytes(b"GIF89a not a pdf")


def test_deterministic_writer():
    a = build_pdf(["same text"], title="T")
    b = build_pdf(["same text"], title="T")
    assert a == b


def test_ray_stage(ray_session):
    import ray.data as rd

    rows = [
        {"doc_id": 1, "pdf": build_pdf(["doc one text"], title="One")},
        {"doc_id": 2, "pdf": build_pdf(["doc two page a", "doc two page b"])},
        {"doc_id": 3, "pdf": b"not a pdf at all"},
    ]
    out = (
        process_pdfs(rd.from_items(rows), concurrency=1)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert list(out["success"]) == [True, True, False]
    assert list(out["n_pages"]) == [1, 2, 0]
    assert out["text"][1] == "doc two page a\ndoc two page b"
    assert out["title"][0] == "One"
    assert out["error"][2]


def test_fuzz_text_roundtrip():
    """Random printable text (parens, backslashes, newlines) survives
    writer→parser byte-exactly."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    printable = st.text(
        alphabet=st.characters(min_codepoint=0x20, max_codepoint=0x7E),
        max_size=200,
    )
    lines = st.lists(printable, min_size=1, max_size=8)

    @given(lines)
    @settings(max_examples=150, deadline=None)
    def check(ls):
        text = "\n".join(ls)
        r = NaivePDFProcessorStrategy().process_bytes(build_pdf([text]))
        assert r.pages[0].raw_text == text

    check()


def test_truncated_pdfs_do_not_crash():
    data = build_pdf(["some text", "more text"], title="T")
    s = NaivePDFProcessorStrategy()
    for cut in range(1, len(data), 97):
        blob = data[:cut]
        try:
            r = s.process_bytes(blob)
            assert r.metadata.pages >= 0  # parsed a prefix, fine
        except ValueError:
            pass  # rejected cleanly — also fine


def test_image_xobject_roundtrip():
    """Writer-embedded Image XObjects come back from the COS walk with
    exact /Width, /Height, /Filter metadata (no codec needed), and
    pages without images enumerate empty."""
    from crawl4ai_custom_ray.functions.pdf import (
        NaivePDFProcessorStrategy,
        build_pdf,
    )

    blob = build_pdf(
        ["page one", "page two"], images=[[(16, 8), (32, 16)], []]
    )
    r = NaivePDFProcessorStrategy().process_bytes(blob)
    assert [(i["name"], i["width"], i["height"], i["filter"]) for i in r.pages[0].images] == [
        ("Im0", 16, 8, "FlateDecode"),
        ("Im1", 32, 16, "FlateDecode"),
    ]
    assert r.pages[1].images == []
    assert r.pages[0].raw_text == "page one"  # text unaffected by Do ops

    # extract_images=False gate mirrors the reference kwarg
    r2 = NaivePDFProcessorStrategy(extract_images=False).process_bytes(blob)
    assert r2.pages[0].images == []
