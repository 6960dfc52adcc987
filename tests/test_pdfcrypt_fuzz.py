"""Corruption fuzz for the ENCRYPTED-PDF path.

Web-crawled encrypted PDFs arrive just as truncated and byte-flipped as
plain ones, but corruption in an /Encrypt dict or an encrypted stream
exercises code the plain-PDF fuzz (test_pdfparse_fuzz.py) never
reaches: legacy key derivation, /U verification, CF selection, AES-CBC
unpadding, and the R6 2.B hash. The contract is the same as the plain
fuzz: every mutation either parses to a well-formed span list or raises
an orderly Exception promptly — no hangs, no interpreter-level crashes.
PyMuPDF (the reference's parser, extract_outline.py:19) gives the same
guarantee natively.
"""

from __future__ import annotations

import random
import zlib

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pdf_extractor_spark.sources import pdfparse

from test_pdfcrypt import (
    _assemble_pdf,
    _aes_encrypt_payload,
    _content_plain,
    _legacy_key,
    _make_o_entry,
    _make_u_entry,
    _obj_key,
)


def _rc4_fixture() -> bytes:
    from pdf_extractor_spark.sources.pdfcrypt import rc4

    n, r, p = 16, 3, -44
    o = _make_o_entry(r, n)
    fkey = _legacy_key(o, p, r, n)
    u = _make_u_entry(fkey, r)
    enc_stream = rc4(_obj_key(fkey, 5, 0, aes=False), zlib.compress(_content_plain()))
    enc = (
        b"<< /Filter /Standard /V 2 /R 3 /Length 128 /P %d /O <%s> /U <%s> >>"
        % (p, o.hex().encode(), u.hex().encode())
    )
    return _assemble_pdf(enc, enc_stream)


def _aes_fixture() -> bytes:
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
    return _assemble_pdf(enc, enc_stream)


_FIXTURES = {"rc4": _rc4_fixture(), "aes": _aes_fixture()}


def _check(payload: bytes) -> None:
    try:
        pages = pdfparse.extract_spans(payload)
    except Exception as exc:  # any *orderly* exception is S4-acceptable
        assert not isinstance(
            exc, (MemoryError, RecursionError, SystemExit, KeyboardInterrupt)
        )
        return
    assert isinstance(pages, list)
    for page in pages:
        for block in page["blocks"]:
            for line in block:
                for span in line:
                    assert isinstance(span["text"], str)
                    assert isinstance(span["size"], (int, float))
                    assert len(span["bbox"]) == 4


@settings(max_examples=60, deadline=10000, suppress_health_check=[HealthCheck.too_slow])
@given(
    kind=st.sampled_from(["rc4", "aes"]),
    seed=st.integers(0, 2**31),
    flips=st.integers(1, 24),
)
def test_encrypted_byteflips_never_crash(kind, seed, flips):
    doc = bytearray(_FIXTURES[kind])
    rng = random.Random(seed)
    for _ in range(flips):
        doc[rng.randrange(len(doc))] ^= 1 << rng.randrange(8)
    _check(bytes(doc))


@settings(max_examples=40, deadline=10000, suppress_health_check=[HealthCheck.too_slow])
@given(kind=st.sampled_from(["rc4", "aes"]), cut=st.floats(0.01, 0.99))
def test_encrypted_truncation_never_crashes(kind, cut):
    doc = _FIXTURES[kind]
    _check(doc[: int(len(doc) * cut)])


@settings(max_examples=40, deadline=10000, suppress_health_check=[HealthCheck.too_slow])
@given(seed=st.integers(0, 2**31), flips=st.integers(1, 12))
def test_corrupted_encrypt_dict_never_crashes(seed, flips):
    """Flips confined to the /Encrypt dict object: corrupt V/R/Length/
    O/U/CF drive the handler's branch selection and key-derivation
    arithmetic directly."""
    doc = _FIXTURES["aes"]
    lo = doc.index(b"/Filter /Standard")
    hi = doc.index(b">>", lo) + 2
    buf = bytearray(doc)
    rng = random.Random(seed)
    for _ in range(flips):
        buf[rng.randrange(lo, hi)] ^= 1 << rng.randrange(8)
    _check(bytes(buf))
