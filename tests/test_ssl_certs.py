"""X.509 DER writer/parser round trip, the reference SSLCertificate
surface, and the cert_features Ray stage (reference
``ssl_certificate.py`` re-expressed as a batch decode over a binary
column)."""

import base64
import hashlib
import shutil
import subprocess

import pyarrow as pa
import pytest

from crawl4ai_custom_ray.functions.ssl_certs import (
    SSLCertificate,
    build_cert_der,
    cert_features,
    parse_cert_der,
)


def _sample(serial=0xABCDEF123456, is_ca=False, sans=("a.example", "www.a.example")):
    return build_cert_der(
        subject={"CN": "a.example", "O": "Org", "C": "US"},
        issuer={"CN": "Root CA", "O": "Trust"},
        serial=serial,
        not_before="200101000000Z",
        not_after="250601120000Z",
        san_dns=list(sans),
        is_ca=is_ca,
    )


def test_round_trip_fields():
    info = parse_cert_der(_sample())
    assert info["subject"] == {"CN": "a.example", "O": "Org", "C": "US"}
    assert info["issuer"] == {"CN": "Root CA", "O": "Trust"}
    assert info["version"] == 3
    assert info["serial_number"] == "0xabcdef123456"
    assert info["not_before"] == "20200101000000Z"
    assert info["not_after"] == "20250601120000Z"
    assert info["san_dns"] == ["a.example", "www.a.example"]
    assert info["is_ca"] is False
    assert info["signature_algorithm"] == "sha256WithRSAEncryption"


def test_ca_flag_and_empty_san():
    der = build_cert_der(
        subject={"CN": "ca"},
        issuer={"CN": "ca"},
        serial=1,
        not_before="200101000000Z",
        not_after="300101000000Z",
        is_ca=True,
    )
    info = parse_cert_der(der)
    assert info["is_ca"] is True
    assert info["san_dns"] == []
    assert info["subject"] == info["issuer"] == {"CN": "ca"}


def test_utctime_century_split():
    # UTCTime years < 50 are 20xx, >= 50 are 19xx (RFC 5280 4.1.2.5.1)
    der = build_cert_der(
        subject={"CN": "x"}, issuer={"CN": "x"}, serial=2,
        not_before="980101000000Z", not_after="490101000000Z",
    )
    info = parse_cert_der(der)
    assert info["not_before"].startswith("1998")
    assert info["not_after"].startswith("2049")


def test_fingerprint_is_sha256_of_der():
    der = _sample()
    assert parse_cert_der(der)["fingerprint"] == hashlib.sha256(der).hexdigest()


def test_reference_class_surface(tmp_path):
    der = _sample()
    cert = SSLCertificate.from_der(der)
    assert cert.subject["CN"] == "a.example"
    assert cert.issuer["CN"] == "Root CA"
    assert cert.valid_from == "20200101000000Z"
    assert cert.valid_until == "20250601120000Z"
    assert cert.fingerprint == hashlib.sha256(der).hexdigest()
    # dict subclass → directly JSON serializable (reference :13-20)
    import json

    assert json.loads(cert.to_json())["subject"]["CN"] == "a.example"
    # export paths (reference to_pem/to_der, :167-199)
    assert cert.to_der() == der
    pem = cert.to_pem()
    assert pem.startswith("-----BEGIN CERTIFICATE-----")
    body = "".join(pem.splitlines()[1:-1])
    assert base64.b64decode(body) == der
    f = tmp_path / "c.json"
    cert.to_json(str(f))
    assert json.loads(f.read_text())["is_ca"] is False


def test_malformed_der_degrades():
    assert SSLCertificate.from_der(b"\x30\x03junk-not-a-cert") is None
    assert SSLCertificate.from_der(b"") is None


@pytest.mark.skipif(shutil.which("openssl") is None, reason="no openssl binary")
def test_external_openssl_agrees(tmp_path):
    """The synthesized DER is real X.509: OpenSSL itself decodes it and
    reports the same serial/subject/validity."""
    der = _sample(serial=77)
    f = tmp_path / "c.der"
    f.write_bytes(der)
    out = subprocess.run(
        ["openssl", "x509", "-inform", "DER", "-in", str(f), "-noout", "-text"],
        capture_output=True,
        text=True,
        check=True,
    ).stdout
    assert "Serial Number: 77 (0x4d)" in out
    # OpenSSL 1.x prints "CN=a.example"; 3.x prints "CN = a.example" —
    # normalize spacing around '=' so the assertion is version-agnostic
    norm = out.replace(" = ", "=")
    assert "Subject: CN=a.example, O=Org, C=US" in norm
    assert "Not Before: Jan  1 00:00:00 2020 GMT" in out
    assert "DNS:a.example" in out
    assert "CA:FALSE" in out


def test_cert_features_stage(ray_session):
    import ray.data as rd

    rows = [
        {"url": "https://a.example/", "cert_der": _sample()},
        {"url": "https://bad.example/", "cert_der": b"not-der"},
        {"url": "https://ca.example/", "cert_der": build_cert_der(
            subject={"CN": "ca.example"}, issuer={"CN": "ca.example"},
            serial=5, not_before="200101000000Z", not_after="300101000000Z",
            is_ca=True)},
    ]
    out = cert_features(rd.from_items(rows)).to_pandas().set_index("url")
    assert bool(out.loc["https://a.example/", "success"])
    assert out.loc["https://a.example/", "subject_cn"] == "a.example"
    assert int(out.loc["https://a.example/", "n_sans"]) == 2
    assert not bool(out.loc["https://bad.example/", "success"])
    assert bool(out.loc["https://ca.example/", "is_ca"])


def test_cert_audit_query_vs_oracle(ray_session):
    import duckdb

    from crawl4ai_custom_ray.oracles import oracle_sql_for
    from crawl4ai_custom_ray.queries import q_cert_audit

    sf = "/root/testdata/sf0.001"
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf}/documents.parquet')"
    )
    out = q_cert_audit(sf).to_pandas()
    odf = con.sql(oracle_sql_for(sf)["cert_audit"]).df()
    cols = sorted(out.columns)
    assert cols == sorted(odf.columns)
    a = out[cols].sort_values(cols).reset_index(drop=True)
    b = odf[cols].sort_values(cols).reset_index(drop=True)
    assert a.astype(str).equals(b.astype(str))
