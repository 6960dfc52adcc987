"""Encrypted-PDF and LZW coverage for the pure-Python parser.

The reference's parser (PyMuPDF) transparently opens RC4/AES files
whose user password is empty (permissions-only encryption — the common
crawl case) and fails on genuinely passworded files. These tests build
real encrypted PDFs with the spec's FORWARD algorithms (O/U generation,
per-object encryption) and assert the parser's DECRYPT path recovers
the exact spans — generator-vs-parser, opposite directions of the
public ISO 32000 algorithms. AES itself is pinned to FIPS-197 vectors.
"""

from __future__ import annotations

import hashlib
import struct
import zlib

import pytest

from pdf_extractor_spark.sources import pdfparse
from pdf_extractor_spark.sources.pdfcrypt import (
    _PAD,
    PdfCryptError,
    StandardSecurityHandler,
    aes_cbc_decrypt,
    aes_cbc_encrypt,
    hash_2b,
    rc4,
)

LINES = [(720, 22, b"Secret Title"), (680, 11, b"body text about data"), (656, 16, b"Methods")]
ID0 = bytes(range(16))


def _content_plain() -> bytes:
    return b"\n".join(
        b"BT /F1 %d Tf 72 %d Td (%s) Tj ET" % (s, y, t) for (y, s, t) in LINES
    )


def _legacy_key(o_entry: bytes, p: int, r: int, n: int, user_pw: bytes = b"") -> bytes:
    h = hashlib.md5()
    h.update((user_pw + _PAD)[:32])
    h.update(o_entry[:32])
    h.update(struct.pack("<i", p))
    h.update(ID0)
    key = h.digest()
    if r >= 3:
        for _ in range(50):
            key = hashlib.md5(key[:n]).digest()
    return key[:n]


def _make_o_entry(r: int, n: int, owner_pw: bytes = b"", user_pw: bytes = b"") -> bytes:
    key = hashlib.md5((owner_pw + _PAD)[:32]).digest()
    if r >= 3:
        for _ in range(50):
            key = hashlib.md5(key[:n]).digest()
    o = rc4(key[:n], (user_pw + _PAD)[:32])
    if r >= 3:
        for i in range(1, 20):
            o = rc4(bytes(b ^ i for b in key[:n]), o)
    return o


def _make_u_entry(fkey: bytes, r: int) -> bytes:
    if r == 2:
        return rc4(fkey, _PAD)
    x = hashlib.md5(_PAD + ID0).digest()
    x = rc4(fkey, x)
    for i in range(1, 20):
        x = rc4(bytes(b ^ i for b in fkey), x)
    return x + b"\x00" * 16


def _obj_key(fkey: bytes, num: int, gen: int, aes: bool) -> bytes:
    h = hashlib.md5(
        fkey + num.to_bytes(3, "little") + gen.to_bytes(2, "little") + (b"sAlT" if aes else b"")
    ).digest()
    return h[: min(len(fkey) + 5, 16)]


def _assemble_pdf(encrypt_dict: bytes, enc_stream: bytes) -> bytes:
    """Minimal 1-page PDF whose content stream is pre-encrypted."""
    objs = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Kids [4 0 R] /Count 1 >>",
        3: b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
        4: (
            b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            b"/Resources << /Font << /F1 3 0 R >> >> /Contents 5 0 R >>"
        ),
        5: b"<< /Length %d /Filter /FlateDecode >>\nstream\n%s\nendstream"
        % (len(enc_stream), enc_stream),
        6: encrypt_dict,
    }
    buf = bytearray(b"%PDF-1.6\n")
    offsets = {}
    for num in sorted(objs):
        offsets[num] = len(buf)
        buf.extend(b"%d 0 obj\n" % num)
        buf.extend(objs[num])
        buf.extend(b"\nendobj\n")
    xref_off = len(buf)
    buf.extend(b"xref\n0 7\n0000000000 65535 f \n")
    for num in range(1, 7):
        buf.extend(b"%010d 00000 n \n" % offsets[num])
    id_hex = ID0.hex().encode()
    buf.extend(
        b"trailer\n<< /Size 7 /Root 1 0 R /Encrypt 6 0 R /ID [<%s> <%s>] >>\n"
        b"startxref\n%d\n%%%%EOF\n" % (id_hex, id_hex, xref_off)
    )
    return bytes(buf)


def _spans(pdf: bytes):
    pages = pdfparse.extract_spans(pdf)
    return [
        (sp["text"], sp["size"])
        for pg in pages
        for blk in pg["blocks"]
        for line in blk
        for sp in line
    ]


EXPECTED = [(t.decode(), float(s)) for (_y, s, t) in LINES]


def test_rc4_128_empty_password_roundtrip():
    n = 16  # 128-bit
    r, p = 3, -44
    o = _make_o_entry(r, n)
    fkey = _legacy_key(o, p, r, n)
    u = _make_u_entry(fkey, r)
    enc_stream = rc4(_obj_key(fkey, 5, 0, aes=False), zlib.compress(_content_plain()))
    enc = (
        b"<< /Filter /Standard /V 2 /R 3 /Length 128 /P %d /O <%s> /U <%s> >>"
        % (p, o.hex().encode(), u.hex().encode())
    )
    assert _spans(_assemble_pdf(enc, enc_stream)) == EXPECTED


def test_rc4_40bit_r2_empty_password_roundtrip():
    n = 5  # 40-bit, V1/R2
    r, p = 2, -1
    o = _make_o_entry(r, n)
    fkey = _legacy_key(o, p, r, n)
    u = _make_u_entry(fkey, r)
    enc_stream = rc4(_obj_key(fkey, 5, 0, aes=False), zlib.compress(_content_plain()))
    enc = b"<< /Filter /Standard /V 1 /R 2 /P %d /O <%s> /U <%s> >>" % (
        p,
        o.hex().encode(),
        u.hex().encode(),
    )
    assert _spans(_assemble_pdf(enc, enc_stream)) == EXPECTED


def _aes_encrypt_payload(key: bytes, plain: bytes) -> bytes:
    iv = bytes(range(16))
    padlen = 16 - len(plain) % 16
    return iv + aes_cbc_encrypt(key, iv, plain + bytes([padlen]) * padlen)


def test_aesv2_128_empty_password_roundtrip():
    n, r, p = 16, 4, -3392
    o = _make_o_entry(r, n)
    fkey = _legacy_key(o, p, r, n)
    u = _make_u_entry(fkey, r)
    enc_stream = _aes_encrypt_payload(
        _obj_key(fkey, 5, 0, aes=True), zlib.compress(_content_plain())
    )
    enc = (
        b"<< /Filter /Standard /V 4 /R 4 /Length 128 /P %d /O <%s> /U <%s> "
        b"/CF << /StdCF << /CFM /AESV2 /Length 16 >> >> /StmF /StdCF /StrF /StdCF >>"
        % (p, o.hex().encode(), u.hex().encode())
    )
    assert _spans(_assemble_pdf(enc, enc_stream)) == EXPECTED


def test_aes256_r6_empty_password_roundtrip():
    fkey = bytes(range(32))  # the real file key
    vsalt, ksalt = b"VALSALT9", b"KEYSALT7"
    u_hash = hash_2b(b"", vsalt)
    ikey = hash_2b(b"", ksalt)
    ue = aes_cbc_encrypt(ikey, b"\x00" * 16, fkey)
    u = u_hash + vsalt + ksalt
    enc_stream = _aes_encrypt_payload(fkey, zlib.compress(_content_plain()))
    enc = (
        b"<< /Filter /Standard /V 5 /R 6 /Length 256 /P -4 /O <%s> /OE <%s> "
        b"/U <%s> /UE <%s> /Perms <0000000000000000> >>"
        % (b"00" * 48, b"00" * 32, u.hex().encode(), ue.hex().encode())
    )
    assert _spans(_assemble_pdf(enc, enc_stream)) == EXPECTED


def test_passworded_pdf_fails_to_s4():
    """Non-empty user password → PdfError → S4 failure row."""
    n, r, p = 16, 3, -44
    o = _make_o_entry(r, n, user_pw=b"hunter2")
    fkey = _legacy_key(o, p, r, n, user_pw=b"hunter2")
    u = _make_u_entry(fkey, r)
    enc_stream = rc4(_obj_key(fkey, 5, 0, aes=False), zlib.compress(_content_plain()))
    enc = (
        b"<< /Filter /Standard /V 2 /R 3 /Length 128 /P %d /O <%s> /U <%s> >>"
        % (p, o.hex().encode(), u.hex().encode())
    )
    with pytest.raises(pdfparse.PdfError, match="password"):
        pdfparse.extract_spans(_assemble_pdf(enc, enc_stream))


def test_unsupported_handler_fails_cleanly():
    enc = b"<< /Filter /FooSecurity /V 9 >>"
    pdf = _assemble_pdf(enc, zlib.compress(_content_plain()))
    with pytest.raises(pdfparse.PdfError, match="unsupported|password|malformed"):
        pdfparse.extract_spans(pdf)


def test_handler_rejects_wrong_u_entry():
    with pytest.raises(PdfCryptError, match="password"):
        StandardSecurityHandler(
            {"Filter": "Standard", "V": 2, "R": 3, "Length": 128, "P": -44,
             "O": b"\x00" * 32, "U": b"\x00" * 32},
            ID0,
        )


# ------------------------------------------------------------------ LZW
def _lzw_encode(data: bytes, early: int = 1) -> bytes:
    """Reference TIFF/PDF LZW encoder for round-trip tests."""
    out = bytearray()
    bitbuf = bitcnt = 0

    def put(code: int, width: int):
        nonlocal bitbuf, bitcnt
        bitbuf = (bitbuf << width) | code
        bitcnt += width
        while bitcnt >= 8:
            out.append((bitbuf >> (bitcnt - 8)) & 0xFF)
            bitcnt -= 8

    table = {bytes([i]): i for i in range(256)}
    next_code = 258
    width = 9
    put(256, width)  # initial clear
    w = b""
    for b in data:
        wc = w + bytes([b])
        if wc in table:
            w = wc
            continue
        put(table[w], width)
        table[wc] = next_code
        next_code += 1
        if next_code + early - 1 >= (1 << width) and width < 12:
            width += 1
        w = bytes([b])
    if w:
        put(table[w], width)
    put(257, width)  # EOD
    if bitcnt:
        out.append((bitbuf << (8 - bitcnt)) & 0xFF)
    return bytes(out)


@pytest.mark.parametrize(
    "payload",
    [
        b"",
        b"A",
        b"TOBEORNOTTOBEORTOBEORNOT" * 3,
        bytes(range(256)) * 2,
        b"aaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaab" * 40,
        _content_plain() * 20,
    ],
)
def test_lzw_roundtrip(payload):
    assert pdfparse._lzw_decode(_lzw_encode(payload)) == payload


def test_lzw_pdf_end_to_end():
    """A plain (unencrypted) PDF whose content stream is LZWDecode —
    the pre-Flate filter of early-90s writers."""
    enc = _lzw_encode(_content_plain())
    buf = bytearray(b"%PDF-1.2\n")
    offsets = {}
    objs = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Kids [4 0 R] /Count 1 >>",
        3: b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
        4: (
            b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            b"/Resources << /Font << /F1 3 0 R >> >> /Contents 5 0 R >>"
        ),
        5: b"<< /Length %d /Filter /LZWDecode >>\nstream\n%s\nendstream" % (len(enc), enc),
    }
    for num in sorted(objs):
        offsets[num] = len(buf)
        buf.extend(b"%d 0 obj\n" % num)
        buf.extend(objs[num])
        buf.extend(b"\nendobj\n")
    xref_off = len(buf)
    buf.extend(b"xref\n0 6\n0000000000 65535 f \n")
    for num in range(1, 6):
        buf.extend(b"%010d 00000 n \n" % offsets[num])
    buf.extend(b"trailer\n<< /Size 6 /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF\n" % xref_off)
    assert _spans(bytes(buf)) == EXPECTED


# --------------------------------------------------------- FIPS vectors
def test_aes_fips197_vectors():
    from pdf_extractor_spark.sources.pdfcrypt import _decrypt_block, _encrypt_block, _expand_key

    pt = bytes.fromhex("00112233445566778899aabbccddeeff")
    cases = [
        ("000102030405060708090a0b0c0d0e0f", 10, "69c4e0d86a7b0430d8cdb78070b4c55a"),
        ("000102030405060708090a0b0c0d0e0f1011121314151617", 12,
         "dda97ca4864cdfe06eaf70a0ec0d7191"),
        ("000102030405060708090a0b0c0d0e0f101112131415161718191a1b1c1d1e1f", 14,
         "8ea2b7ca516745bfeafc49904b496089"),
    ]
    for key_hex, nr, ct_hex in cases:
        w = _expand_key(bytes.fromhex(key_hex))
        ct = _encrypt_block(pt, w, nr)
        assert ct.hex() == ct_hex
        assert _decrypt_block(ct, w, nr) == pt


def test_rc4_known_vector():
    assert rc4(b"Key", b"Plaintext").hex().upper() == "BBF316E8D940AF0AD3"
    assert rc4(b"Secret", b"Attack at dawn").hex().upper() == "45A01F645FC35B383552544B9BF5"


# --------------------------------------------------------- RunLength
def _rle_encode(data: bytes) -> bytes:
    """Minimal ISO 32000-1 §7.4.5 encoder (runs >=3 as repeats)."""
    out = bytearray()
    i = 0
    while i < len(data):
        run = 1
        while i + run < len(data) and run < 128 and data[i + run] == data[i]:
            run += 1
        if run >= 3:
            out += bytes([257 - run, data[i]])
            i += run
        else:
            j = i + run
            while j < len(data) and j - i < 128:
                nxt = 1
                while j + nxt < len(data) and nxt < 3 and data[j + nxt] == data[j]:
                    nxt += 1
                if nxt >= 3:
                    break
                j += 1
            out += bytes([j - i - 1]) + data[i:j]
            i = j
    out.append(128)
    return bytes(out)


@pytest.mark.parametrize(
    "payload",
    [b"", b"A", b"aaaaaaaabbbbcdef", bytes(range(256)), b"x" * 1000, _content_plain()],
)
def test_runlength_roundtrip(payload):
    d = {"Filter": "RunLengthDecode"}
    assert pdfparse._decode_stream(d, _rle_encode(payload), None) == payload


def test_runlength_pdf_end_to_end():
    enc = _rle_encode(_content_plain())
    buf = bytearray(b"%PDF-1.2\n")
    offsets = {}
    objs = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Kids [4 0 R] /Count 1 >>",
        3: b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
        4: (
            b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            b"/Resources << /Font << /F1 3 0 R >> >> /Contents 5 0 R >>"
        ),
        5: b"<< /Length %d /Filter /RunLengthDecode >>\nstream\n%s\nendstream"
        % (len(enc), enc),
    }
    for num in sorted(objs):
        offsets[num] = len(buf)
        buf.extend(b"%d 0 obj\n" % num)
        buf.extend(objs[num])
        buf.extend(b"\nendobj\n")
    xref_off = len(buf)
    buf.extend(b"xref\n0 6\n0000000000 65535 f \n")
    for num in range(1, 6):
        buf.extend(b"%010d 00000 n \n" % offsets[num])
    buf.extend(b"trailer\n<< /Size 6 /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF\n" % xref_off)
    assert _spans(bytes(buf)) == EXPECTED


def test_v4_40bit_strf_identity_empty_password():
    """V4 with a 40-bit /StdCF stream filter and /StrF /Identity:
    the Identity placeholder must not inflate the derived key length
    (review finding: kb=max(5,16) broke legit 40-bit V4 files)."""
    n, r, p = 5, 4, -44
    o = _make_o_entry(r, n)
    fkey = _legacy_key(o, p, r, n)
    u = _make_u_entry(fkey, r)
    enc_stream = rc4(_obj_key(fkey, 5, 0, aes=False), zlib.compress(_content_plain()))
    enc = (
        b"<< /Filter /Standard /V 4 /R 4 /P %d /O <%s> /U <%s> "
        b"/CF << /StdCF << /CFM /V2 /Length 5 >> >> /StmF /StdCF /StrF /Identity >>"
        % (p, o.hex().encode(), u.hex().encode())
    )
    assert _spans(_assemble_pdf(enc, enc_stream)) == EXPECTED


def test_v4_cf_length_defaults_to_dict_length():
    """CF entry without /Length falls back to the encryption dict's
    top-level /Length (here 40 bit), not a hardcoded 16 bytes."""
    n, r, p = 5, 4, -44
    o = _make_o_entry(r, n)
    fkey = _legacy_key(o, p, r, n)
    u = _make_u_entry(fkey, r)
    enc_stream = rc4(_obj_key(fkey, 5, 0, aes=False), zlib.compress(_content_plain()))
    enc = (
        b"<< /Filter /Standard /V 4 /R 4 /Length 40 /P %d /O <%s> /U <%s> "
        b"/CF << /StdCF << /CFM /V2 >> >> /StmF /StdCF /StrF /StdCF >>"
        % (p, o.hex().encode(), u.hex().encode())
    )
    assert _spans(_assemble_pdf(enc, enc_stream)) == EXPECTED


def test_corrupt_encrypt_entries_raise_crypt_error():
    """Corrupt /Encrypt entries (array where a number or the /CF dict
    belongs) must triage as PdfCryptError in lineage, not raw
    TypeError/AttributeError (sweep finding)."""
    import pytest

    from pdf_extractor_spark.sources.pdfcrypt import (
        PdfCryptError,
        StandardSecurityHandler,
    )

    base = {"Filter": "Standard", "R": 3, "P": -44, "O": "x" * 32, "U": "y" * 32}
    for bad in (
        dict(base, V=[1, 2]),
        dict(base, V=2, Length=[128]),
        dict(base, V=4, CF=[1], StmF="StdCF", StrF="StdCF"),
    ):
        with pytest.raises(PdfCryptError):
            StandardSecurityHandler(bad, b"id0")
