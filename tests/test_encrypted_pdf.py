"""Empty-password encrypted PDFs extract; passworded ones reject.

The reference extracts standard-security-handler documents whose USER
password is empty: pdf.js tries "" by default (CipherTransformFactory) and
only raises PasswordException when that fails. These tests author encrypted
fixtures with the spec's own O/U algorithms (Algorithms 2/3/4/5 for RC4-era
revisions, ISO 32000-2 Algorithm 2.B + 8 for R6/AES-256) and assert the
engine decrypts transparently — and still rejects non-empty-password files
as ``pdf:encrypted`` error rows.

Cipher primitives are pinned to published test vectors first so the
fixture-authoring code can't silently agree with a broken implementation.
"""

from __future__ import annotations

import hashlib

import numpy as np

from pdf_parse_new_spark.kernels import crypt, pdfb

OPS = b"BT /F1 12 Tf 1 0 0 1 72 700 Tm (decrypted page text) Tj ET"
ID0 = bytes(range(16))
TITLE = "Secret Title"


# --------------------------------------------------------------------- vectors


def test_rc4_known_vectors():
    assert crypt.rc4(b"Key", b"Plaintext").hex() == "bbf316e8d940af0ad3"
    assert crypt.rc4(b"Wiki", b"pedia").hex() == "1021bf0420"
    assert (
        crypt.rc4(b"Secret", b"Attack at dawn").hex()
        == "45a01f645fc35b383552544b9bf5"
    )


def test_aes_fips197_vectors():
    # FIPS-197 Appendix B (AES-128) and C.3 (AES-256)
    rk = crypt._expand_key(bytes.fromhex("2b7e151628aed2a6abf7158809cf4f3c"))
    pt = np.frombuffer(
        bytes.fromhex("3243f6a8885a308d313198a2e0370734"), np.uint8
    ).reshape(1, 16)
    ct = crypt._ecb_encrypt_blocks(pt, rk).tobytes()
    assert ct.hex() == "3925841d02dc09fbdc118597196a0b32"
    assert crypt._ecb_decrypt_blocks(
        np.frombuffer(ct, np.uint8).reshape(1, 16), rk
    ).tobytes() == pt.tobytes()
    rk = crypt._expand_key(bytes(range(32)))
    pt = np.frombuffer(
        bytes.fromhex("00112233445566778899aabbccddeeff"), np.uint8
    ).reshape(1, 16)
    ct = crypt._ecb_encrypt_blocks(pt, rk).tobytes()
    assert ct.hex() == "8ea2b7ca516745bfeafc49904b496089"


def test_aes_cbc_roundtrip_multiblock():
    key, iv = bytes(range(16)), bytes(range(16, 32))
    data = bytes(range(256)) * 3
    assert crypt.aes_cbc_decrypt(key, iv, crypt.aes_cbc_encrypt(key, iv, data)) == data


# ------------------------------------------------------------------- fixtures


def _aes_encrypt_padded(key: bytes, data: bytes) -> bytes:
    pad = 16 - len(data) % 16
    iv = b"\xab" * 16  # any IV works; it rides in the ciphertext prefix
    return iv + crypt.aes_cbc_encrypt(key, iv, data + bytes([pad]) * pad)


def _assemble_encrypted(enc_dict: bytes, enc_stream_body: bytes,
                        enc_title: bytes) -> bytes:
    """Page scaffold + /Encrypt + /ID; content stream and /Info /Title are
    ciphertext authored by the caller."""
    objects = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        3: b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>",
        4: b"<< /Length %d >>\nstream\n%s\nendstream"
           % (len(enc_stream_body), enc_stream_body),
        7: b"<< /Title <%s> >>" % enc_title.hex().encode(),
        9: enc_dict,
    }
    out = bytearray(b"%PDF-1.6\n%\xe2\xe3\xcf\xd3\n")
    offsets = {}
    for num in sorted(objects):
        offsets[num] = len(out)
        out += b"%d 0 obj\n" % num + objects[num] + b"\nendobj\n"
    xref_off = len(out)
    size = max(objects) + 1
    out += b"xref\n0 %d\n" % size
    out += b"0000000000 65535 f \n"
    for num in range(1, size):
        if num in offsets:
            out += b"%010d 00000 n \n" % offsets[num]
        else:
            out += b"0000000000 65535 f \n"
    out += (
        b"trailer\n<< /Size %d /Root 1 0 R /Info 7 0 R /Encrypt 9 0 R "
        b"/ID [<%s> <%s>] >>\nstartxref\n%d\n%%%%EOF"
        % (size, ID0.hex().encode(), ID0.hex().encode(), xref_off)
    )
    return bytes(out)


def _obj_key(file_key: bytes, num: int, gen: int, aes: bool) -> bytes:
    ext = b"sAlT" if aes else b""
    h = hashlib.md5(
        file_key + num.to_bytes(3, "little") + gen.to_bytes(2, "little") + ext
    ).digest()
    return h[: min(len(file_key) + 5, 16)]


def _build_rc4_doc(r: int, v: int, key_bits: int) -> bytes:
    """Author an empty-owner/empty-user RC4 document (Algorithms 2/3/4/5)."""
    p = -44
    # Algorithm 3: /O from the (empty) owner password
    okey = hashlib.md5(crypt.PAD).digest()
    if r >= 3:
        for _ in range(50):
            okey = hashlib.md5(okey).digest()
    okey = okey[: key_bits // 8 if r >= 3 else 5]
    o = crypt.rc4(okey, crypt.PAD)
    if r >= 3:
        for i in range(1, 20):
            o = crypt.rc4(bytes(b ^ i for b in okey), o)
    file_key = crypt.compute_file_key_rc4(b"", o, p, ID0, r, key_bits // 8)
    u = crypt.compute_u_value(file_key, ID0, r)
    if r >= 3:
        u = u + b"\x00" * 16  # files pad /U to 32 arbitrary bytes
    enc_dict = (
        b"<< /Filter /Standard /V %d /R %d /Length %d /O <%s> /U <%s> /P %d >>"
        % (v, r, key_bits, o.hex().encode(), u.hex().encode(), p)
    )
    body = crypt.rc4(_obj_key(file_key, 4, 0, False), OPS)
    title = crypt.rc4(
        _obj_key(file_key, 7, 0, False), TITLE.encode("latin-1")
    )
    return _assemble_encrypted(enc_dict, body, title)


def _assert_decrypts(doc: bytes) -> None:
    r = pdfb.parse_pdf_bytes(doc)
    assert r["error"] is None, r["error"]
    assert r["text"].strip() == "decrypted page text"
    assert r["info"].get("Title") == TITLE
    assert r["n_pages"] == 1


def test_rc4_40bit_r2_empty_password_decrypts():
    _assert_decrypts(_build_rc4_doc(r=2, v=1, key_bits=40))


def test_rc4_128bit_r3_empty_password_decrypts():
    _assert_decrypts(_build_rc4_doc(r=3, v=2, key_bits=128))


def test_rc4_v4_cf_length_40_bits_decrypts():
    """Regression: a /CF Length of exactly 40 written in BITS (40-bit
    RC4, the dominant writer convention for that boundary value) was
    read as 40 bytes, deriving a wrong key and rejecting the document
    as password-protected."""
    r, key_bits = 4, 40
    p = -44
    okey = hashlib.md5(crypt.PAD).digest()
    for _ in range(50):
        okey = hashlib.md5(okey).digest()
    okey = okey[: key_bits // 8]
    o = crypt.rc4(okey, crypt.PAD)
    for i in range(1, 20):
        o = crypt.rc4(bytes(b ^ i for b in okey), o)
    file_key = crypt.compute_file_key_rc4(b"", o, p, ID0, r, key_bits // 8)
    u = crypt.compute_u_value(file_key, ID0, r) + b"\x00" * 16
    enc_dict = (
        b"<< /Filter /Standard /V 4 /R 4 /Length %d /O <%s> /U <%s> /P %d "
        b"/CF << /StdCF << /CFM /V2 /Length 40 >> >> "
        b"/StmF /StdCF /StrF /StdCF >>"
        % (key_bits, o.hex().encode(), u.hex().encode(), p)
    )
    body = crypt.rc4(_obj_key(file_key, 4, 0, False), OPS)
    title = crypt.rc4(_obj_key(file_key, 7, 0, False), TITLE.encode("latin-1"))
    _assert_decrypts(_assemble_encrypted(enc_dict, body, title))


def test_aes128_v4_r4_empty_password_decrypts():
    p = -3392
    okey = hashlib.md5(crypt.PAD).digest()
    for _ in range(50):
        okey = hashlib.md5(okey).digest()
    o = crypt.rc4(okey[:16], crypt.PAD)
    for i in range(1, 20):
        o = crypt.rc4(bytes(b ^ i for b in okey[:16]), o)
    file_key = crypt.compute_file_key_rc4(b"", o, p, ID0, 4, 16)
    u = crypt.compute_u_value(file_key, ID0, 4) + b"\x00" * 16
    enc_dict = (
        b"<< /Filter /Standard /V 4 /R 4 /Length 128 /O <%s> /U <%s> /P %d "
        b"/CF << /StdCF << /CFM /AESV2 /Length 16 >> >> "
        b"/StmF /StdCF /StrF /StdCF >>"
        % (o.hex().encode(), u.hex().encode(), p)
    )
    body = _aes_encrypt_padded(_obj_key(file_key, 4, 0, True), OPS)
    title = _aes_encrypt_padded(
        _obj_key(file_key, 7, 0, True), TITLE.encode("latin-1")
    )
    _assert_decrypts(_assemble_encrypted(enc_dict, body, title))


def _build_r6_doc(password: bytes) -> bytes:
    vsalt, ksalt = b"01234567", b"89abcdef"
    u = crypt.hash_2b(password, vsalt) + vsalt + ksalt
    ikey = crypt.hash_2b(password, ksalt)
    file_key = bytes(range(32))
    ue = crypt.aes_cbc_encrypt(ikey, b"\x00" * 16, file_key)
    o = b"\x11" * 48  # owner-path entries unused for user-password auth
    oe = b"\x22" * 32
    enc_dict = (
        b"<< /Filter /Standard /V 5 /R 6 /Length 256 /O <%s> /U <%s> "
        b"/OE <%s> /UE <%s> /P -4 "
        b"/CF << /StdCF << /CFM /AESV3 /Length 32 >> >> "
        b"/StmF /StdCF /StrF /StdCF >>"
        % (o.hex().encode(), u.hex().encode(), oe.hex().encode(),
           ue.hex().encode())
    )
    body = _aes_encrypt_padded(file_key, OPS)
    title = _aes_encrypt_padded(file_key, TITLE.encode("latin-1"))
    return _assemble_encrypted(enc_dict, body, title)


def test_aes256_v5_r6_empty_password_decrypts():
    _assert_decrypts(_build_r6_doc(b""))


def test_nonempty_password_still_rejects():
    # same R6 layout but /U derived from a real password: the empty-password
    # try fails and the doc surfaces the reference's rejection as an error row
    r = pdfb.parse_pdf_bytes(_build_r6_doc(b"hunter2"))
    assert r["error"] == "pdf:encrypted"
    assert r["text"] == "" and r["n_pages"] == 0


def test_encrypted_doc_through_spark_operator(spark, tmp_path):
    # end-to-end: binaryFile source -> mapInPandas decrypts transparently
    from pdf_parse_new_spark.operators import extract as ex

    (tmp_path / "enc.pdf").write_bytes(_build_rc4_doc(r=3, v=2, key_bits=128))
    (tmp_path / "locked.pdf").write_bytes(_build_r6_doc(b"pw"))
    df = spark.read.format("binaryFile").load(str(tmp_path))
    rows = {r.doc_id.rsplit("/", 1)[-1]: r
            for r in ex.extract_pdf_documents(df).collect()}
    assert rows["enc.pdf"].error is None
    assert "decrypted page text" in rows["enc.pdf"].text
    assert rows["locked.pdf"].error == "pdf:encrypted"


def test_encrypted_doc_mutations_never_crash():
    """Corruption sweep over an encrypted fixture: truncations and byte
    flips (including inside /Encrypt, O/U strings, and ciphertext) must
    yield a result dict — decrypted, error row, or garbage text — never an
    exception (the malformed-input-never-fails-a-task contract)."""
    raw = _build_rc4_doc(r=3, v=2, key_bits=128)
    n = len(raw)
    cases = [raw[: int(n * f)] for f in (0.05, 0.4, 0.9, 0.99)]
    for off in (0, n // 4, n // 2, 3 * n // 4, n - 64):
        b = bytearray(raw)
        for i in range(off, min(off + 48, n)):
            b[i] ^= 0xA5
        cases.append(bytes(b))
    r6 = _build_r6_doc(b"")
    cases.append(r6[: len(r6) // 2])
    b = bytearray(r6)
    for i in range(len(b) // 3, len(b) // 3 + 64):
        b[i] ^= 0x3C
    cases.append(bytes(b))
    for i, payload in enumerate(cases):
        r = pdfb.parse_pdf_bytes(payload)
        assert isinstance(r["text"], str), i
        assert r["error"] is None or isinstance(r["error"], str), i
