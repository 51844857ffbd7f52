"""SSL-certificate capture as a data operation.

The reference's ``ssl_certificate.py`` (203 LoC) opens a TLS socket to
the page's host, pulls the peer certificate and decodes it with
pyOpenSSL into a dict (subject/issuer components, validity window,
serial, fingerprint, extensions) attached to the ``CrawlResult``
(``ssl_certificate.py:62-134``).  In a batch engine the certificate is
a **binary DER column** and the decode is a stateless ``map_batches``
stage — so this module provides:

* a minimal **DER (ASN.1) reader** for X.509 v3 certificates — pure
  stdlib, enough structure for the reference's surface: version,
  serial, signature algorithm, issuer/subject RDNs, validity
  (UTCTime/GeneralizedTime), subjectAltName dNSNames, basicConstraints
  CA flag, SHA-256 fingerprint;
* a deterministic **DER writer** that synthesizes a structurally valid
  (dummy-signed) certificate from field values — the test/bench corpus
  generator, mirroring the PDF round-trip convention
  (``functions/pdf.py``): any writer/parser defect breaks the
  ``cert_audit`` oracle match;
* :class:`SSLCertificate` — the reference's dict-subclass surface
  (``issuer``/``subject``/``valid_from``/``valid_until``/
  ``fingerprint`` properties, ``to_json``/``to_pem``/``to_der``)
  backed by the stdlib parser instead of pyOpenSSL;
* :func:`cert_features` — the Ray stage: Dataset with a
  ``cert_der`` binary column → one row of typed fields per cert.

Live capture (the reference's ``SSLCertificate.from_url``) needs a TLS
socket; :func:`fetch_cert_der` implements it with stdlib ``ssl`` +
``socket`` and is exercised only where a network exists (none in this
sandbox — errors degrade to ``None`` exactly like the reference's
``from_url`` error paths, ``ssl_certificate.py:113-127``).
"""

from __future__ import annotations

import base64
import hashlib
import json
from pathlib import Path

# ---------------------------------------------------------------- DER
# Universal tags used by X.509
_INT = 0x02
_BITSTR = 0x03
_OCTSTR = 0x04
_NULL = 0x05
_OID = 0x06
_UTF8 = 0x0C
_PRINTABLE = 0x13
_IA5 = 0x16
_UTCTIME = 0x17
_GENTIME = 0x18
_SEQ = 0x30
_SET = 0x31
_CTX0 = 0xA0  # [0] EXPLICIT (version)
_CTX3 = 0xA3  # [3] EXPLICIT (extensions)
_DNSNAME = 0x82  # [2] IMPLICIT IA5String inside GeneralName

#: attribute-type OIDs → reference short names (pyOpenSSL components)
_NAME_OIDS = {
    "2.5.4.3": "CN",
    "2.5.4.6": "C",
    "2.5.4.7": "L",
    "2.5.4.8": "ST",
    "2.5.4.10": "O",
    "2.5.4.11": "OU",
}
_NAME_OIDS_REV = {v: k for k, v in _NAME_OIDS.items()}

_SIG_ALGS = {
    "1.2.840.113549.1.1.11": "sha256WithRSAEncryption",
    "1.2.840.113549.1.1.5": "sha1WithRSAEncryption",
    "1.2.840.10045.4.3.2": "ecdsa-with-SHA256",
}
_OID_SAN = "2.5.29.17"
_OID_BASIC = "2.5.29.19"
_OID_RSA = "1.2.840.113549.1.1.1"
_OID_SHA256RSA = "1.2.840.113549.1.1.11"


def _enc_len(n: int) -> bytes:
    if n < 0x80:
        return bytes([n])
    body = n.to_bytes((n.bit_length() + 7) // 8, "big")
    return bytes([0x80 | len(body)]) + body


def _tlv(tag: int, content: bytes) -> bytes:
    return bytes([tag]) + _enc_len(len(content)) + content


def _enc_int(v: int) -> bytes:
    body = v.to_bytes((v.bit_length() + 8) // 8 or 1, "big", signed=True)
    return _tlv(_INT, body)


def _enc_oid(dotted: str) -> bytes:
    parts = [int(p) for p in dotted.split(".")]
    body = bytearray([40 * parts[0] + parts[1]])
    for p in parts[2:]:
        chunk = bytearray([p & 0x7F])
        p >>= 7
        while p:
            chunk.append((p & 0x7F) | 0x80)
            p >>= 7
        body.extend(reversed(chunk))
    return _tlv(_OID, bytes(body))


def _dec_oid(body: bytes) -> str:
    parts = [body[0] // 40, body[0] % 40]
    val = 0
    for b in body[1:]:
        val = (val << 7) | (b & 0x7F)
        if not b & 0x80:
            parts.append(val)
            val = 0
    return ".".join(str(p) for p in parts)


def _read_tlv(buf: bytes, pos: int) -> tuple[int, bytes, int]:
    """(tag, content, next_pos); definite lengths only (DER)."""
    tag = buf[pos]
    ln = buf[pos + 1]
    pos += 2
    if ln & 0x80:
        n = ln & 0x7F
        ln = int.from_bytes(buf[pos : pos + n], "big")
        pos += n
    return tag, buf[pos : pos + ln], pos + ln


def _children(content: bytes) -> list[tuple[int, bytes]]:
    out, pos = [], 0
    while pos < len(content):
        tag, body, pos = _read_tlv(content, pos)
        out.append((tag, body))
    return out


# ------------------------------------------------------------- writer


def build_cert_der(
    *,
    subject: dict,
    issuer: dict,
    serial: int,
    not_before: str,
    not_after: str,
    san_dns: list[str] | None = None,
    is_ca: bool = False,
) -> bytes:
    """Deterministic structurally-valid X.509 v3 DER certificate.

    ``not_before``/``not_after`` are UTCTime strings
    (``YYMMDDHHMMSSZ``).  The signature is a fixed dummy bit string —
    parsers that don't verify signatures (including this module's
    reader and the reference's field extraction) see a normal cert.
    """

    def name(rdns: dict) -> bytes:
        out = b""
        for key, value in rdns.items():
            atv = _tlv(
                _SEQ,
                _enc_oid(_NAME_OIDS_REV[key]) + _tlv(_UTF8, value.encode()),
            )
            out += _tlv(_SET, atv)
        return _tlv(_SEQ, out)

    sig_alg = _tlv(_SEQ, _enc_oid(_OID_SHA256RSA) + _tlv(_NULL, b""))
    validity = _tlv(
        _SEQ, _tlv(_UTCTIME, not_before.encode()) + _tlv(_UTCTIME, not_after.encode())
    )
    # tiny dummy RSA public key (structure only)
    pubkey = _tlv(
        _SEQ,
        _tlv(_SEQ, _enc_oid(_OID_RSA) + _tlv(_NULL, b""))
        + _tlv(_BITSTR, b"\x00" + _tlv(_SEQ, _enc_int(0x10001) + _enc_int(3))),
    )
    exts = b""
    if san_dns:
        generals = b"".join(_tlv(_DNSNAME, d.encode()) for d in san_dns)
        exts += _tlv(
            _SEQ, _enc_oid(_OID_SAN) + _tlv(_OCTSTR, _tlv(_SEQ, generals))
        )
    bc_body = _tlv(_SEQ, b"\x01\x01\xff" if is_ca else b"")
    exts += _tlv(_SEQ, _enc_oid(_OID_BASIC) + _tlv(_OCTSTR, bc_body))
    tbs = _tlv(
        _SEQ,
        _tlv(_CTX0, _enc_int(2))  # v3
        + _enc_int(serial)
        + sig_alg
        + name(issuer)
        + validity
        + name(subject)
        + pubkey
        + _tlv(_CTX3, _tlv(_SEQ, exts)),
    )
    return _tlv(_SEQ, tbs + sig_alg + _tlv(_BITSTR, b"\x00" + b"\x2a" * 16))


# ------------------------------------------------------------- reader


def parse_cert_der(der: bytes) -> dict:
    """X.509 v3 DER → field dict (the reference's ``cert_info`` shape,
    ``ssl_certificate.py:93-111``, minus the pyOpenSSL-only bits)."""
    _, cert_body, _ = _read_tlv(der, 0)
    tbs_tag, tbs_body, pos = _read_tlv(cert_body, 0)
    fields = _children(tbs_body)
    idx = 0
    version = 1
    if fields[idx][0] == _CTX0:  # [0] EXPLICIT version
        vbody = _children(fields[idx][1])[0][1]
        version = int.from_bytes(vbody, "big", signed=True) + 1
        idx += 1
    serial = int.from_bytes(fields[idx][1], "big", signed=True)
    idx += 1
    sig_oid = _dec_oid(_children(fields[idx][1])[0][1])
    idx += 1

    def name_dict(body: bytes) -> dict:
        out = {}
        for _tag, rdn_set in _children(body):
            for _t2, atv in _children(rdn_set):
                kids = _children(atv)
                oid = _dec_oid(kids[0][1])
                out[_NAME_OIDS.get(oid, oid)] = kids[1][1].decode(
                    "utf-8", errors="replace"
                )
        return out

    issuer = name_dict(fields[idx][1])
    idx += 1
    times = _children(fields[idx][1])
    idx += 1

    def norm_time(tag: int, body: bytes) -> str:
        s = body.decode()
        if tag == _UTCTIME:
            # pyOpenSSL/OpenSSL notBefore format is GeneralizedTime-
            # style YYYYMMDDHHMMSSZ; UTCTime years <50 are 20xx
            yy = int(s[:2])
            s = ("20" if yy < 50 else "19") + s
        return s

    not_before = norm_time(*times[0])
    not_after = norm_time(*times[1])
    subject = name_dict(fields[idx][1])
    idx += 1
    idx += 1  # subjectPublicKeyInfo (structure not surfaced)
    san: list[str] = []
    is_ca = False
    extensions: list[dict] = []
    for tag, body in fields[idx:]:
        if tag != _CTX3:
            continue
        ext_seq = _children(body)[0][1]  # [3] EXPLICIT wraps a SEQUENCE
        for _t, ext in _children(ext_seq):
            kids = _children(ext)
            oid = _dec_oid(kids[0][1])
            # optional critical BOOLEAN sits between OID and OCTET STRING
            value = kids[-1][1]
            extensions.append({"name": oid, "value": value})
            if oid == _OID_SAN:
                _t3, generals = _read_tlv(value, 0)[:2]
                san = [
                    b.decode("utf-8", errors="replace")
                    for t, b in _children(generals)
                    if t == _DNSNAME
                ]
            elif oid == _OID_BASIC:
                _t4, bc = _read_tlv(value, 0)[:2]
                is_ca = any(
                    t == 0x01 and b == b"\xff" for t, b in _children(bc)
                )
    return {
        "subject": subject,
        "issuer": issuer,
        "version": version,
        "serial_number": hex(serial),
        "not_before": not_before,
        "not_after": not_after,
        "fingerprint": hashlib.sha256(der).hexdigest(),
        "signature_algorithm": _SIG_ALGS.get(sig_oid, sig_oid),
        "san_dns": san,
        "is_ca": is_ca,
        "raw_cert": base64.b64encode(der).decode(),
    }


# ------------------------------------------- reference class surface


class SSLCertificate(dict):
    """Dict-subclass certificate record — the reference's surface
    (``ssl_certificate.py:13-203``) with the stdlib parser behind it."""

    def __init__(self, cert_info: dict):
        super().__init__(cert_info)

    @staticmethod
    def from_der(der: bytes) -> "SSLCertificate | None":
        try:
            return SSLCertificate(parse_cert_der(der))
        except Exception:
            return None

    @staticmethod
    def from_url(url: str, timeout: int = 10) -> "SSLCertificate | None":
        der = fetch_cert_der(url, timeout=timeout)
        return SSLCertificate.from_der(der) if der else None

    @property
    def issuer(self) -> dict:
        return self.get("issuer", {})

    @property
    def subject(self) -> dict:
        return self.get("subject", {})

    @property
    def valid_from(self) -> str:
        return self.get("not_before", "")

    @property
    def valid_until(self) -> str:
        return self.get("not_after", "")

    @property
    def fingerprint(self) -> str:
        return self.get("fingerprint", "")

    def to_json(self, filepath: str | None = None) -> str | None:
        s = json.dumps(self, indent=2, ensure_ascii=False)
        if filepath:
            Path(filepath).write_text(s, encoding="utf-8")
            return None
        return s

    def to_der(self, filepath: str | None = None) -> bytes | None:
        der = base64.b64decode(self.get("raw_cert", ""))
        if filepath:
            Path(filepath).write_bytes(der)
            return None
        return der

    def to_pem(self, filepath: str | None = None) -> str | None:
        b64 = base64.b64encode(self.to_der() or b"").decode()
        lines = [b64[i : i + 64] for i in range(0, len(b64), 64)]
        pem = (
            "-----BEGIN CERTIFICATE-----\n"
            + "\n".join(lines)
            + "\n-----END CERTIFICATE-----\n"
        )
        if filepath:
            Path(filepath).write_text(pem, encoding="utf-8")
            return None
        return pem


def fetch_cert_der(url: str, timeout: int = 10) -> bytes | None:
    """Live peer-certificate capture (reference ``from_url``,
    ``ssl_certificate.py:62-127``): TLS handshake, binary cert.  Needs
    a network; every failure returns None like the reference."""
    import socket
    import ssl as _ssl
    from urllib.parse import urlparse

    try:
        hostname = urlparse(url).netloc.split(":")[0]
        ctx = _ssl.create_default_context()
        with socket.create_connection((hostname, 443), timeout=timeout) as sock:
            with ctx.wrap_socket(sock, server_hostname=hostname) as ssock:
                return ssock.getpeercert(binary_form=True)
    except Exception:
        return None


# ----------------------------------------------------------- Ray stage


def cert_features(ds, *, der_column: str = "cert_der", id_column: str = "url"):
    """Dataset with a binary DER column → typed per-cert fields.
    Stateless ``map_batches`` (the decode holds no state); malformed
    certs degrade to ``success=False`` rows, never exceptions."""
    import pyarrow as pa

    def batch_fn(batch: pa.Table) -> pa.Table:
        ids = batch[id_column].to_pylist()
        ders = batch[der_column].to_pylist()
        cols: dict[str, list] = {
            id_column: ids,
            "success": [],
            "subject_cn": [],
            "issuer_cn": [],
            "serial": [],
            "not_before": [],
            "not_after": [],
            "n_sans": [],
            "is_ca": [],
            "sig_alg": [],
            "version": [],
            "fingerprint": [],
        }
        for der in ders:
            try:
                info = parse_cert_der(der)
                cols["success"].append(True)
                cols["subject_cn"].append(info["subject"].get("CN", ""))
                cols["issuer_cn"].append(info["issuer"].get("CN", ""))
                cols["serial"].append(int(info["serial_number"], 16))
                cols["not_before"].append(info["not_before"])
                cols["not_after"].append(info["not_after"])
                cols["n_sans"].append(len(info["san_dns"]))
                cols["is_ca"].append(info["is_ca"])
                cols["sig_alg"].append(info["signature_algorithm"])
                cols["version"].append(info["version"])
                cols["fingerprint"].append(info["fingerprint"])
            except Exception:
                cols["success"].append(False)
                for k in (
                    "subject_cn", "issuer_cn", "not_before", "not_after", "sig_alg", "fingerprint",
                ):
                    cols[k].append("")
                for k in ("serial", "n_sans", "version"):
                    cols[k].append(0)
                cols["is_ca"].append(False)
        return pa.table(
            {
                id_column: pa.array(cols[id_column], pa.string()),
                "success": pa.array(cols["success"], pa.bool_()),
                "subject_cn": pa.array(cols["subject_cn"], pa.string()),
                "issuer_cn": pa.array(cols["issuer_cn"], pa.string()),
                "serial": pa.array(cols["serial"], pa.int64()),
                "not_before": pa.array(cols["not_before"], pa.string()),
                "not_after": pa.array(cols["not_after"], pa.string()),
                "n_sans": pa.array(cols["n_sans"], pa.int32()),
                "is_ca": pa.array(cols["is_ca"], pa.bool_()),
                "sig_alg": pa.array(cols["sig_alg"], pa.string()),
                "version": pa.array(cols["version"], pa.int32()),
                "fingerprint": pa.array(cols["fingerprint"], pa.string()),
            }
        )

    return ds.map_batches(batch_fn, batch_format="pyarrow", zero_copy_batch=True)
