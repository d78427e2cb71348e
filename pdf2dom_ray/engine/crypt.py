"""PDF standard security handler (empty user password) — RC4 + AES.

PDFBox transparently decrypts standard-security PDFs with an empty
user password on load (`PDFToHTML.java:73` → ``PDDocument.load``); a
real crawl contains many such files. This module re-implements the
standard handler from the PDF spec (ISO 32000-1 §7.6.3, ISO 32000-2
§7.6.4 for AES-256/R6) with hashlib + a pure-numpy AES:

* Revisions 2/3/4: RC4 40-128 bit, or V4 crypt filters (/V2 RC4,
  /AESV2 AES-128-CBC), per-object keys via Algorithm 1.
* Revision 6: AES-256 with the 2.B iterated SHA-256/384/512 KDF.

Wrong/owner-only passwords raise ``WrongPasswordError`` → the caller
degrades to a clean error row (the engine never guesses passwords).

AES decryption is vectorized across blocks (CBC decryption is
embarrassingly parallel before the XOR-chain); encryption (needed only
inside the R6 KDF on small buffers) is scalar per block.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np

__all__ = ["WrongPasswordError", "UnsupportedEncryptionError",
           "StandardSecurityHandler", "rc4", "aes_cbc_decrypt",
           "aes_cbc_encrypt"]


class WrongPasswordError(Exception):
    pass


class UnsupportedEncryptionError(Exception):
    pass


_PAD = bytes([
    0x28, 0xBF, 0x4E, 0x5E, 0x4E, 0x75, 0x8A, 0x41, 0x64, 0x00, 0x4E, 0x56,
    0xFF, 0xFA, 0x01, 0x08, 0x2E, 0x2E, 0x00, 0xB6, 0xD0, 0x68, 0x3E, 0x80,
    0x2F, 0x0C, 0xA9, 0xFE, 0x64, 0x53, 0x69, 0x7A])


def rc4(key: bytes, data: bytes) -> bytes:
    s = list(range(256))
    j = 0
    klen = len(key)
    for i in range(256):
        j = (j + s[i] + key[i % klen]) & 0xFF
        s[i], s[j] = s[j], s[i]
    out = bytearray(len(data))
    i = j = 0
    for n, b in enumerate(data):
        i = (i + 1) & 0xFF
        j = (j + s[i]) & 0xFF
        s[i], s[j] = s[j], s[i]
        out[n] = b ^ s[(s[i] + s[j]) & 0xFF]
    return bytes(out)


# ---------------------------------------------------------------------------
# AES (FIPS-197) — numpy tables
# ---------------------------------------------------------------------------

_SBOX = bytes.fromhex(
    "637c777bf26b6fc53001672bfed7ab76ca82c97dfa5947f0add4a2af9ca472c0"
    "b7fd9326363ff7cc34a5e5f171d8311504c723c31896059a071280e2eb27b275"
    "09832c1a1b6e5aa0523bd6b329e32f8453d100ed20fcb15b6acbbe394a4c58cf"
    "d0efaafb434d338545f9027f503c9fa851a3408f929d38f5bcb6da2110fff3d2"
    "cd0c13ec5f974417c4a77e3d645d197360814fdc222a908846eeb814de5e0bdb"
    "e0323a0a4906245cc2d3ac629195e479e7c8376d8dd54ea96c56f4ea657aae08"
    "ba78252e1ca6b4c6e8dd741f4bbd8b8a703eb5664803f60e613557b986c11d9e"
    "e1f8981169d98e949b1e87e9ce5528df8ca1890dbfe6426841992d0fb054bb16")
_INV_SBOX = bytearray(256)
for _i, _v in enumerate(_SBOX):
    _INV_SBOX[_v] = _i
_INV_SBOX = bytes(_INV_SBOX)

_SBOX_NP = np.frombuffer(_SBOX, dtype=np.uint8)
_INV_SBOX_NP = np.frombuffer(_INV_SBOX, dtype=np.uint8)


def _xtime_table():
    t = np.arange(256, dtype=np.uint16)
    x = (t << 1) ^ np.where(t & 0x80, 0x1B, 0)
    return (x & 0xFF).astype(np.uint8)


_X2 = _xtime_table()
_X4 = _X2[_X2]
_X8 = _X2[_X4]


def _gmul_table(c: int) -> np.ndarray:
    t = np.zeros(256, dtype=np.uint8)
    idx = np.arange(256, dtype=np.uint8)
    acc = np.zeros(256, dtype=np.uint8)
    if c & 1:
        acc ^= idx
    if c & 2:
        acc ^= _X2[idx]
    if c & 4:
        acc ^= _X4[idx]
    if c & 8:
        acc ^= _X8[idx]
    t[:] = acc
    return t


_M9, _M11, _M13, _M14 = (_gmul_table(c) for c in (9, 11, 13, 14))
_M2, _M3 = _gmul_table(2), _gmul_table(3)

_RCON = [0x01, 0x02, 0x04, 0x08, 0x10, 0x20, 0x40, 0x80, 0x1B, 0x36,
         0x6C, 0xD8, 0xAB, 0x4D]

# column-major state layout: byte i of a block is state[i % 4][i // 4]
_SHIFT = np.array([0, 5, 10, 15, 4, 9, 14, 3, 8, 13, 2, 7, 12, 1, 6, 11])
_INV_SHIFT = np.array([0, 13, 10, 7, 4, 1, 14, 11, 8, 5, 2, 15, 12, 9, 6, 3])


def _expand_key(key: bytes) -> np.ndarray:
    nk = len(key) // 4
    nr = nk + 6
    w = [list(key[4 * i:4 * i + 4]) for i in range(nk)]
    for i in range(nk, 4 * (nr + 1)):
        t = list(w[i - 1])
        if i % nk == 0:
            t = t[1:] + t[:1]
            t = [_SBOX[b] for b in t]
            t[0] ^= _RCON[i // nk - 1]
        elif nk > 6 and i % nk == 4:
            t = [_SBOX[b] for b in t]
        w.append([a ^ b for a, b in zip(w[i - nk], t)])
    rk = np.array(w, dtype=np.uint8).reshape(nr + 1, 16)
    return rk


def _encrypt_blocks(blocks: np.ndarray, rk: np.ndarray) -> np.ndarray:
    """(N, 16) uint8 ECB encrypt, vectorized across blocks."""
    nr = len(rk) - 1
    s = blocks ^ rk[0]
    for rnd in range(1, nr + 1):
        s = _SBOX_NP[s]
        s = s[:, _SHIFT]
        if rnd < nr:
            a = s.reshape(-1, 4, 4)
            b0, b1, b2, b3 = a[:, :, 0], a[:, :, 1], a[:, :, 2], a[:, :, 3]
            m = np.empty_like(a)
            m[:, :, 0] = _M2[b0] ^ _M3[b1] ^ b2 ^ b3
            m[:, :, 1] = b0 ^ _M2[b1] ^ _M3[b2] ^ b3
            m[:, :, 2] = b0 ^ b1 ^ _M2[b2] ^ _M3[b3]
            m[:, :, 3] = _M3[b0] ^ b1 ^ b2 ^ _M2[b3]
            s = m.reshape(-1, 16)
        s = s ^ rk[rnd]
    return s


def _decrypt_blocks(blocks: np.ndarray, rk: np.ndarray) -> np.ndarray:
    """(N, 16) uint8 ECB decrypt, vectorized across blocks."""
    nr = len(rk) - 1
    s = blocks ^ rk[nr]
    for rnd in range(nr - 1, -1, -1):
        s = s[:, _INV_SHIFT]
        s = _INV_SBOX_NP[s]
        s = s ^ rk[rnd]
        if rnd > 0:
            a = s.reshape(-1, 4, 4)
            b0, b1, b2, b3 = a[:, :, 0], a[:, :, 1], a[:, :, 2], a[:, :, 3]
            m = np.empty_like(a)
            m[:, :, 0] = _M14[b0] ^ _M11[b1] ^ _M13[b2] ^ _M9[b3]
            m[:, :, 1] = _M9[b0] ^ _M14[b1] ^ _M11[b2] ^ _M13[b3]
            m[:, :, 2] = _M13[b0] ^ _M9[b1] ^ _M14[b2] ^ _M11[b3]
            m[:, :, 3] = _M11[b0] ^ _M13[b1] ^ _M9[b2] ^ _M14[b3]
            s = m.reshape(-1, 16)
    return s


# scalar T-table encryption (CBC is sequential across blocks; per-block
# numpy overhead dominates there, so the chain uses 32-bit T-tables)
_TE0 = [0] * 256
_TE1 = [0] * 256
_TE2 = [0] * 256
_TE3 = [0] * 256
for _i in range(256):
    _s = _SBOX[_i]
    _s2 = int(_M2[_s])
    _s3 = int(_M3[_s])
    _TE0[_i] = (_s2 << 24) | (_s << 16) | (_s << 8) | _s3
    _TE1[_i] = (_s3 << 24) | (_s2 << 16) | (_s << 8) | _s
    _TE2[_i] = (_s << 24) | (_s3 << 16) | (_s2 << 8) | _s
    _TE3[_i] = (_s << 24) | (_s << 16) | (_s3 << 8) | _s2


def _expand_key_words(key: bytes) -> list[int]:
    rk = _expand_key(key)
    words = []
    for rnd in rk:
        b = rnd.tobytes()
        for c in range(4):
            words.append(int.from_bytes(b[4 * c:4 * c + 4], "big"))
    return words


def _encrypt_block_words(s0, s1, s2, s3, w, nr):
    s0 ^= w[0]
    s1 ^= w[1]
    s2 ^= w[2]
    s3 ^= w[3]
    k = 4
    for _ in range(nr - 1):
        t0 = (_TE0[s0 >> 24] ^ _TE1[(s1 >> 16) & 255]
              ^ _TE2[(s2 >> 8) & 255] ^ _TE3[s3 & 255] ^ w[k])
        t1 = (_TE0[s1 >> 24] ^ _TE1[(s2 >> 16) & 255]
              ^ _TE2[(s3 >> 8) & 255] ^ _TE3[s0 & 255] ^ w[k + 1])
        t2 = (_TE0[s2 >> 24] ^ _TE1[(s3 >> 16) & 255]
              ^ _TE2[(s0 >> 8) & 255] ^ _TE3[s1 & 255] ^ w[k + 2])
        t3 = (_TE0[s3 >> 24] ^ _TE1[(s0 >> 16) & 255]
              ^ _TE2[(s1 >> 8) & 255] ^ _TE3[s2 & 255] ^ w[k + 3])
        s0, s1, s2, s3 = t0, t1, t2, t3
        k += 4
    sb = _SBOX
    r0 = ((sb[s0 >> 24] << 24) | (sb[(s1 >> 16) & 255] << 16)
          | (sb[(s2 >> 8) & 255] << 8) | sb[s3 & 255]) ^ w[k]
    r1 = ((sb[s1 >> 24] << 24) | (sb[(s2 >> 16) & 255] << 16)
          | (sb[(s3 >> 8) & 255] << 8) | sb[s0 & 255]) ^ w[k + 1]
    r2 = ((sb[s2 >> 24] << 24) | (sb[(s3 >> 16) & 255] << 16)
          | (sb[(s0 >> 8) & 255] << 8) | sb[s1 & 255]) ^ w[k + 2]
    r3 = ((sb[s3 >> 24] << 24) | (sb[(s0 >> 16) & 255] << 16)
          | (sb[(s1 >> 8) & 255] << 8) | sb[s2 & 255]) ^ w[k + 3]
    return r0, r1, r2, r3


def aes_cbc_encrypt(key: bytes, iv: bytes, data: bytes) -> bytes:
    """CBC encrypt, NO padding (len(data) must be a block multiple)."""
    if len(data) % 16:
        raise ValueError("aes_cbc_encrypt needs 16-byte-aligned input")
    w = _expand_key_words(key)
    nr = len(key) // 4 + 6
    p0 = int.from_bytes(iv[0:4], "big")
    p1 = int.from_bytes(iv[4:8], "big")
    p2 = int.from_bytes(iv[8:12], "big")
    p3 = int.from_bytes(iv[12:16], "big")
    out = bytearray()
    for off in range(0, len(data), 16):
        b = data[off:off + 16]
        p0, p1, p2, p3 = _encrypt_block_words(
            p0 ^ int.from_bytes(b[0:4], "big"),
            p1 ^ int.from_bytes(b[4:8], "big"),
            p2 ^ int.from_bytes(b[8:12], "big"),
            p3 ^ int.from_bytes(b[12:16], "big"), w, nr)
        out += p0.to_bytes(4, "big") + p1.to_bytes(4, "big") \
            + p2.to_bytes(4, "big") + p3.to_bytes(4, "big")
    return bytes(out)


def aes_cbc_decrypt(key: bytes, data: bytes, *, iv: bytes | None = None,
                    strip_padding: bool = True) -> bytes:
    """CBC decrypt. When ``iv`` is None the first 16 bytes of ``data``
    are the IV (PDF AESV2/AESV3 stream layout). Block decryption is
    vectorized; the XOR chain is a single shifted-array XOR."""
    if iv is None:
        if len(data) < 16:
            return b""
        iv, data = data[:16], data[16:]
    n = len(data) // 16
    if n == 0:
        return b""
    data = data[:n * 16]
    rk = _expand_key(key)
    blocks = np.frombuffer(data, dtype=np.uint8).reshape(n, 16)
    plain = _decrypt_blocks(blocks, rk)
    chain = np.vstack([np.frombuffer(iv, dtype=np.uint8)[np.newaxis, :],
                       blocks[:-1]])
    plain = plain ^ chain
    out = plain.tobytes()
    if strip_padding and out:
        pad = out[-1]
        if 1 <= pad <= 16:
            out = out[:-pad]
    return out


# ---------------------------------------------------------------------------
# standard security handler
# ---------------------------------------------------------------------------

def _as_bytes(v) -> bytes:
    if isinstance(v, bytes):
        return v
    if isinstance(v, str):
        return v.encode("latin-1", "replace")
    return b""


def _hash_2b(password: bytes, salt: bytes, udata: bytes) -> bytes:
    """ISO 32000-2 Algorithm 2.B iterated hash (R6)."""
    k = hashlib.sha256(password + salt + udata).digest()
    i = 0
    while True:
        k1 = (password + k + udata) * 64
        e = aes_cbc_encrypt(k[:16], k[16:32], k1)
        mod = sum(e[:16]) % 3
        if mod == 0:
            k = hashlib.sha256(e).digest()
        elif mod == 1:
            k = hashlib.sha384(e).digest()
        else:
            k = hashlib.sha512(e).digest()
        i += 1
        if i >= 64 and e[-1] <= i - 32:
            return k[:32]


class StandardSecurityHandler:
    """Decryptor for /Filter /Standard encryption, empty user password.

    ``decrypt(num, gen, data, is_string)`` applies the object cipher.
    """

    def __init__(self, enc: dict, file_id: bytes, resolve=lambda v: v):
        if str(resolve(enc.get("Filter"))) != "Standard":
            raise UnsupportedEncryptionError(
                f"unsupported security handler {enc.get('Filter')}")
        self.v = int(resolve(enc.get("V", 0)) or 0)
        self.r = int(resolve(enc.get("R", 2)) or 2)
        self.o = _as_bytes(resolve(enc.get("O")))
        self.u = _as_bytes(resolve(enc.get("U")))
        p = int(resolve(enc.get("P", -1)) or -1)
        self.p = p & 0xFFFFFFFF
        self.length = int(resolve(enc.get("Length", 40)) or 40)
        self.encrypt_metadata = bool(resolve(enc.get("EncryptMetadata",
                                                     True)))
        self.file_id = file_id
        self.stm_cipher = "rc4"
        self.str_cipher = "rc4"

        if self.v in (1, 2):
            keylen = 5 if self.v == 1 else max(5, self.length // 8)
            self.key = self._alg2(b"", keylen)
            self._check_user_password_r234()
        elif self.v == 4:
            cf = resolve(enc.get("CF")) or {}
            stmf = str(resolve(enc.get("StmF", "Identity")) or "Identity")
            strf = str(resolve(enc.get("StrF", "Identity")) or "Identity")
            self.stm_cipher = self._cf_method(cf, stmf, resolve)
            self.str_cipher = self._cf_method(cf, strf, resolve)
            keylen = max(5, self.length // 8)
            if self.stm_cipher == "aes" or self.str_cipher == "aes":
                keylen = 16
            self.key = self._alg2(b"", keylen)
            self._check_user_password_r234()
        elif self.v == 5:
            if self.r not in (5, 6):
                raise UnsupportedEncryptionError(f"V5 with R{self.r}")
            self.stm_cipher = self.str_cipher = "aes256"
            ue = _as_bytes(resolve(enc.get("UE")))
            if len(self.u) < 48 or len(ue) < 32:
                raise UnsupportedEncryptionError("malformed /U //UE")
            vsalt, ksalt = self.u[32:40], self.u[40:48]
            if self.r == 6:
                if _hash_2b(b"", vsalt, b"") != self.u[:32]:
                    raise WrongPasswordError("empty user password rejected")
                ikey = _hash_2b(b"", ksalt, b"")
            else:   # R5 (deprecated Adobe extension): plain SHA-256
                if hashlib.sha256(vsalt).digest() != self.u[:32]:
                    raise WrongPasswordError("empty user password rejected")
                ikey = hashlib.sha256(ksalt).digest()
            self.key = aes_cbc_decrypt(ikey, ue[:32], iv=b"\x00" * 16,
                                       strip_padding=False)
        else:
            raise UnsupportedEncryptionError(f"encryption V{self.v}")

    @staticmethod
    def _cf_method(cf: dict, name: str, resolve) -> str:
        if name == "Identity":
            return "identity"
        f = resolve(cf.get(name)) or {}
        method = str(resolve(f.get("CFM", "None")))
        if method == "V2":
            return "rc4"
        if method == "AESV2":
            return "aes"
        if method == "AESV3":
            return "aes256"
        if method == "None":
            return "identity"
        raise UnsupportedEncryptionError(f"crypt filter method {method}")

    def _alg2(self, password: bytes, keylen: int) -> bytes:
        pw = (password + _PAD)[:32]
        h = hashlib.md5()
        h.update(pw)
        h.update(self.o[:32])
        h.update(struct.pack("<I", self.p))
        h.update(self.file_id)
        if self.r >= 4 and not self.encrypt_metadata:
            h.update(b"\xff\xff\xff\xff")
        key = h.digest()
        if self.r >= 3:
            for _ in range(50):
                key = hashlib.md5(key[:keylen]).digest()
        return key[:keylen]

    def _check_user_password_r234(self) -> None:
        """Algorithm 4/5 verification of the empty user password."""
        if self.r == 2:
            expect = rc4(self.key, _PAD)
            ok = expect == self.u[:32]
        else:
            h = hashlib.md5(_PAD + self.file_id).digest()
            step = rc4(self.key, h)
            for i in range(1, 20):
                k = bytes(b ^ i for b in self.key)
                step = rc4(k, step)
            ok = step[:16] == self.u[:16]
        if not ok:
            raise WrongPasswordError("empty user password rejected")

    def _object_key(self, num: int, gen: int, aes: bool) -> bytes:
        h = hashlib.md5()
        h.update(self.key)
        h.update(struct.pack("<I", num)[:3])
        h.update(struct.pack("<I", gen)[:2])
        if aes:
            h.update(b"sAlT")
        return h.digest()[:min(len(self.key) + 5, 16)]

    def decrypt(self, num: int, gen: int, data: bytes,
                is_string: bool = False) -> bytes:
        cipher = self.str_cipher if is_string else self.stm_cipher
        if cipher == "identity" or not data:
            return data
        if cipher == "aes256":
            return aes_cbc_decrypt(self.key, data)
        if cipher == "aes":
            return aes_cbc_decrypt(self._object_key(num, gen, True), data)
        return rc4(self._object_key(num, gen, False), data)
