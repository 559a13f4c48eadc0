"""Ciphers + the PDF standard security handler (empty-password documents).

The reference extracts encrypted documents whose user password is empty:
pdf.js tries the empty password by default and only raises PasswordException
when that fails (pdf.worker.js CipherTransformFactory — the handler below
mirrors its decisions, cited as spec). We reimplement the required
primitives from their public specifications — RC4 (RFC-style KSA/PRGA),
AES-128/256 (FIPS-197), and the PDF 1.7 / ISO 32000-2 standard security
handler key algorithms (Algorithms 2, 2.A/2.B, 4, 5) — because the sandbox
has no crypto libraries.

AES decryption is numpy-vectorized across blocks: CBC *decryption*
parallelizes (every block's ECB step is independent; the chaining XOR is a
shifted-array XOR afterwards), so large encrypted content streams decode at
array speed, not per-byte Python speed. CBC *encryption* (only used by the
R6 key-derivation hash over ~4 KB) stays sequential.
"""

from __future__ import annotations

import hashlib

import numpy as np

# --------------------------------------------------------------------------
# RC4
# --------------------------------------------------------------------------


def rc4(key: bytes, data: bytes) -> bytes:
    s = list(range(256))
    j = 0
    klen = len(key)
    for i in range(256):
        j = (j + s[i] + key[i % klen]) & 0xFF
        s[i], s[j] = s[j], s[i]
    out = bytearray(len(data))
    i = j = 0
    for k, c in enumerate(data):
        i = (i + 1) & 0xFF
        j = (j + s[i]) & 0xFF
        s[i], s[j] = s[j], s[i]
        out[k] = c ^ s[(s[i] + s[j]) & 0xFF]
    return bytes(out)


# --------------------------------------------------------------------------
# AES (FIPS-197), tables generated at import
# --------------------------------------------------------------------------

_EXP = [0] * 512
_LOG = [0] * 256


def _init_gf() -> None:
    x = 1
    for i in range(255):
        _EXP[i] = x
        _LOG[x] = i
        x ^= (x << 1) ^ (0x11B if x & 0x80 else 0)
    for i in range(255, 512):
        _EXP[i] = _EXP[i - 255]


_init_gf()


def _gf_mul(a: int, b: int) -> int:
    if a == 0 or b == 0:
        return 0
    return _EXP[_LOG[a] + _LOG[b]]


def _make_sbox() -> tuple[np.ndarray, np.ndarray]:
    sbox = np.zeros(256, dtype=np.uint8)
    for x in range(256):
        inv = _EXP[255 - _LOG[x]] if x else 0
        y = inv
        for _ in range(4):
            inv = ((inv << 1) | (inv >> 7)) & 0xFF
            y ^= inv
        sbox[x] = y ^ 0x63
    inv_sbox = np.zeros(256, dtype=np.uint8)
    inv_sbox[sbox] = np.arange(256, dtype=np.uint8)
    return sbox, inv_sbox


_SBOX, _INV_SBOX = _make_sbox()
# GF(2^8) multiply-by-constant lookup tables for (Inv)MixColumns
_T2, _T3 = (np.array([_gf_mul(x, c) for x in range(256)], dtype=np.uint8)
            for c in (2, 3))
_T9, _T11, _T13, _T14 = (
    np.array([_gf_mul(x, c) for x in range(256)], dtype=np.uint8)
    for c in (9, 11, 13, 14)
)
# state layout: 16 bytes per block, column-major (bytes 0-3 = column 0)
_SHIFT = np.array([0, 5, 10, 15, 4, 9, 14, 3, 8, 13, 2, 7, 12, 1, 6, 11])
_INV_SHIFT = np.array([0, 13, 10, 7, 4, 1, 14, 11, 8, 5, 2, 15, 12, 9, 6, 3])
_RCON = [0x01, 0x02, 0x04, 0x08, 0x10, 0x20, 0x40, 0x80, 0x1B, 0x36, 0x6C]


def _expand_key(key: bytes) -> np.ndarray:
    nk = len(key) // 4
    nr = nk + 6
    words = [list(key[4 * i : 4 * i + 4]) for i in range(nk)]
    sbox = _SBOX
    for i in range(nk, 4 * (nr + 1)):
        t = list(words[i - 1])
        if i % nk == 0:
            t = t[1:] + t[:1]
            t = [int(sbox[b]) for b in t]
            t[0] ^= _RCON[i // nk - 1]
        elif nk > 6 and i % nk == 4:
            t = [int(sbox[b]) for b in t]
        words.append([a ^ b for a, b in zip(words[i - nk], t)])
    flat = np.array(words, dtype=np.uint8).reshape(nr + 1, 16)
    return flat


def _ecb_encrypt_blocks(blocks: np.ndarray, rk: np.ndarray) -> np.ndarray:
    nr = rk.shape[0] - 1
    s = blocks ^ rk[0]
    for rnd in range(1, nr):
        s = _SBOX[s][:, _SHIFT]
        a = s.reshape(-1, 4, 4)
        s0, s1, s2, s3 = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
        m0 = _T2[s0] ^ _T3[s1] ^ s2 ^ s3
        m1 = s0 ^ _T2[s1] ^ _T3[s2] ^ s3
        m2 = s0 ^ s1 ^ _T2[s2] ^ _T3[s3]
        m3 = _T3[s0] ^ s1 ^ s2 ^ _T2[s3]
        s = np.stack([m0, m1, m2, m3], axis=-1).reshape(-1, 16) ^ rk[rnd]
    s = _SBOX[s][:, _SHIFT] ^ rk[nr]
    return s


def _ecb_decrypt_blocks(blocks: np.ndarray, rk: np.ndarray) -> np.ndarray:
    nr = rk.shape[0] - 1
    s = blocks ^ rk[nr]
    for rnd in range(nr - 1, 0, -1):
        s = _INV_SBOX[s[:, _INV_SHIFT]] ^ rk[rnd]
        a = s.reshape(-1, 4, 4)
        s0, s1, s2, s3 = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
        m0 = _T14[s0] ^ _T11[s1] ^ _T13[s2] ^ _T9[s3]
        m1 = _T9[s0] ^ _T14[s1] ^ _T11[s2] ^ _T13[s3]
        m2 = _T13[s0] ^ _T9[s1] ^ _T14[s2] ^ _T11[s3]
        m3 = _T11[s0] ^ _T13[s1] ^ _T9[s2] ^ _T14[s3]
        s = np.stack([m0, m1, m2, m3], axis=-1).reshape(-1, 16)
    s = _INV_SBOX[s[:, _INV_SHIFT]] ^ rk[0]
    return s


def aes_cbc_decrypt(key: bytes, iv: bytes, data: bytes) -> bytes:
    """CBC decrypt WITHOUT padding removal; truncates a ragged tail."""
    n = len(data) // 16
    if n == 0:
        return b""
    ct = np.frombuffer(data[: n * 16], dtype=np.uint8).reshape(n, 16)
    pt = _ecb_decrypt_blocks(ct, _expand_key(key))
    prev = np.vstack(
        [np.frombuffer(iv, dtype=np.uint8).reshape(1, 16), ct[:-1]]
    )
    return (pt ^ prev).tobytes()


def aes_cbc_encrypt(key: bytes, iv: bytes, data: bytes) -> bytes:
    """CBC encrypt WITHOUT padding (callers pad; R6 KDF data is 16-aligned).
    Sequential by nature — used only on small KDF inputs."""
    rk = _expand_key(key)
    prev = np.frombuffer(iv, dtype=np.uint8)
    out = bytearray()
    for i in range(0, len(data) - 15, 16):
        block = np.frombuffer(data[i : i + 16], dtype=np.uint8) ^ prev
        prev = _ecb_encrypt_blocks(block.reshape(1, 16), rk)[0]
        out += prev.tobytes()
    return bytes(out)


def _strip_pkcs7(pt: bytes) -> bytes:
    if not pt:
        return pt
    pad = pt[-1]
    if 1 <= pad <= 16 and pt.endswith(bytes([pad]) * pad):
        return pt[:-pad]
    return pt  # tolerate bad padding (pdf.js AESBaseCipher does too)


# --------------------------------------------------------------------------
# Standard security handler (PDF 1.7 §7.6.3 / ISO 32000-2 §7.6.4)
# --------------------------------------------------------------------------

PAD = bytes(
    [
        0x28, 0xBF, 0x4E, 0x5E, 0x4E, 0x75, 0x8A, 0x41,
        0x64, 0x00, 0x4E, 0x56, 0xFF, 0xFA, 0x01, 0x08,
        0x2E, 0x2E, 0x00, 0xB6, 0xD0, 0x68, 0x3E, 0x80,
        0x2F, 0x0C, 0xA9, 0xFE, 0x64, 0x53, 0x69, 0x7A,
    ]
)


def _md5(*parts: bytes) -> bytes:
    h = hashlib.md5()
    for p in parts:
        h.update(p)
    return h.digest()


def compute_file_key_rc4(
    password: bytes, o: bytes, p: int, id0: bytes, r: int,
    key_len: int, encrypt_metadata: bool = True,
) -> bytes:
    """Algorithm 2: the RC4-era encryption key (R2-R4)."""
    padded = (password + PAD)[:32]
    p_le = (p & 0xFFFFFFFF).to_bytes(4, "little")
    parts = [padded, o[:32], p_le, id0]
    if r >= 4 and not encrypt_metadata:
        parts.append(b"\xff\xff\xff\xff")
    key = _md5(*parts)[: key_len if r >= 3 else 5]
    if r >= 3:
        for _ in range(50):
            key = _md5(key[:key_len])[:key_len]
    return key[: key_len if r >= 3 else 5]


def compute_u_value(key: bytes, id0: bytes, r: int) -> bytes:
    """Algorithm 4 (R2) / 5 (R3+): the /U entry for a given file key."""
    if r == 2:
        return rc4(key, PAD)
    u = rc4(key, _md5(PAD, id0))
    for i in range(1, 20):
        u = rc4(bytes(b ^ i for b in key), u)
    return u  # 16 bytes; files pad to 32 with arbitrary bytes


def hash_2b(password: bytes, salt: bytes, udata: bytes = b"") -> bytes:
    """ISO 32000-2 Algorithm 2.B — the R6 iterated SHA-2/AES hash."""
    k = hashlib.sha256(password + salt + udata).digest()
    i = 0
    while True:
        k1 = (password + k + udata) * 64
        e = aes_cbc_encrypt(k[:16], k[16:32], k1)
        mod = sum(e[:16]) % 3
        k = (hashlib.sha256, hashlib.sha384, hashlib.sha512)[mod](e).digest()
        i += 1
        if i >= 64 and e[-1] <= i - 32:
            return k[:32]


class StandardSecurityHandler:
    """Decrypts strings/streams of an empty-user-password document.

    ``authenticate(enc_dict, id0)`` -> handler or None (password required).
    ``decrypt(data, num, gen, is_string)`` applies the per-object cipher the
    way pdf.js CipherTransformFactory does.
    """

    def __init__(self, file_key: bytes, v: int, cfm: str,
                 stmf_identity: bool, strf_identity: bool) -> None:
        self.file_key = file_key
        self.v = v
        self.cfm = cfm  # "V2" (RC4) | "AESV2" | "AESV3" | "RC4" pre-V4
        self.stmf_identity = stmf_identity
        self.strf_identity = strf_identity

    # -- construction -------------------------------------------------------

    @classmethod
    def authenticate(cls, enc: dict, id0: bytes) -> "StandardSecurityHandler | None":
        if str(enc.get("Filter", "")) != "Standard":
            return None  # public-key & custom handlers: password path only
        v = int(enc.get("V", 0) or 0)
        r = int(enc.get("R", 0) or 0)
        o = bytes(enc.get("O", b"") or b"")
        u = bytes(enc.get("U", b"") or b"")
        p = int(enc.get("P", 0) or 0)
        if v in (1, 2, 4):
            key_len = int(enc.get("Length", 40) or 40) // 8
            cfm, stmf_id, strf_id = "RC4", False, False
            if v == 4:
                cfm, stmf_id, strf_id, key_len = cls._crypt_filters(
                    enc, key_len
                )
            em = enc.get("EncryptMetadata", True)
            em = bool(em) if isinstance(em, bool) else True
            key = compute_file_key_rc4(b"", o, p, id0, r, key_len, em)
            want = compute_u_value(key, id0, r)
            have = u[: len(want)] if r == 2 else u[:16]
            if want[: len(have)] != have:
                return None
            return cls(key, v, cfm, stmf_id, strf_id)
        if v == 5:  # AES-256 (R5 legacy / R6)
            if len(u) < 48:
                return None
            vsalt, ksalt = u[32:40], u[40:48]
            if r == 6:
                if hash_2b(b"", vsalt) != u[:32]:
                    return None
                ikey = hash_2b(b"", ksalt)
            else:  # R5 (deprecated Adobe extension): plain SHA-256
                if hashlib.sha256(vsalt).digest() != u[:32]:
                    return None
                ikey = hashlib.sha256(ksalt).digest()
            ue = bytes(enc.get("UE", b"") or b"")
            if len(ue) < 32:
                return None
            file_key = aes_cbc_decrypt(ikey, b"\x00" * 16, ue[:32])
            cfm, stmf_id, strf_id, _ = cls._crypt_filters(enc, 32)
            if cfm == "RC4":
                cfm = "AESV3"
            return cls(file_key, v, cfm, stmf_id, strf_id)
        return None

    @staticmethod
    def _crypt_filters(enc: dict, key_len: int) -> tuple[str, bool, bool, int]:
        cf = enc.get("CF") or {}
        stmf = str(enc.get("StmF", "Identity"))
        strf = str(enc.get("StrF", "Identity"))
        name = stmf if stmf != "Identity" else strf
        cfm = "V2"
        if isinstance(cf, dict) and name in cf and isinstance(cf[name], dict):
            cfm = str(cf[name].get("CFM", "V2"))
            ln = cf[name].get("Length")
            if isinstance(ln, int):
                # /CF Length is in BYTES per spec but some writers use
                # bits; 40 itself is near-universally 40-bit RC4 (5
                # bytes), so >= 40 reads as bits
                key_len = ln // 8 if ln >= 40 else ln
        if cfm == "AESV2":
            key_len = 16
        return cfm, stmf == "Identity", strf == "Identity", key_len

    # -- per-object decryption ----------------------------------------------

    def _object_key(self, num: int, gen: int, aes: bool) -> bytes:
        ext = b"sAlT" if aes else b""
        h = _md5(
            self.file_key,
            num.to_bytes(3, "little"),
            gen.to_bytes(2, "little"),
            ext,
        )
        return h[: min(len(self.file_key) + 5, 16)]

    def decrypt(self, data: bytes, num: int, gen: int,
                is_string: bool = False) -> bytes:
        if is_string and self.strf_identity and self.v >= 4:
            return data
        if not is_string and self.stmf_identity and self.v >= 4:
            return data
        if self.v == 5:  # AESV3: file key used directly
            if len(data) < 16:
                return b""
            return _strip_pkcs7(
                aes_cbc_decrypt(self.file_key, data[:16], data[16:])
            )
        if self.cfm == "AESV2":
            if len(data) < 16:
                return b""
            key = self._object_key(num, gen, aes=True)
            return _strip_pkcs7(aes_cbc_decrypt(key, data[:16], data[16:]))
        return rc4(self._object_key(num, gen, aes=False), data)
