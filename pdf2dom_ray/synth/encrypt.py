"""Encrypt an unencrypted fixture PDF with the standard security
handler (empty user + owner password) — RC4-128 (R3), AES-128 (R4
/AESV2) or AES-256 (R6 /AESV3).

Fixture-side counterpart of ``engine/crypt.py`` so tests can prove the
transparent-decryption path end-to-end without any crypto library
(mirrors what PDFBox-protected corpus files look like:
`PDFToHTML.java:73` loads them with no password argument).

Deterministic by construction: IVs and salts are derived from object
numbers / fixed constants, so encrypted fixtures are byte-stable.
"""

from __future__ import annotations

import hashlib
import struct

from ..engine.cos import Lexer, Name, PdfDocument, Ref, Stream
from ..engine.crypt import _PAD, _hash_2b, aes_cbc_encrypt, rc4

__all__ = ["encrypt_pdf"]


def _ser(v) -> bytes:
    if isinstance(v, Name):
        return b"/" + v.encode("latin-1")
    if isinstance(v, bool):
        return b"true" if v else b"false"
    if v is None:
        return b"null"
    if isinstance(v, Ref):
        return f"{v[0]} {v[1]} R".encode()
    if isinstance(v, int):
        return str(v).encode()
    if isinstance(v, float):
        return f"{v:g}".encode()
    if isinstance(v, bytes):
        return b"<" + v.hex().encode() + b">"
    if isinstance(v, str):            # plain str: treat as name-ish text
        return b"/" + v.encode("latin-1")
    if isinstance(v, list):
        return b"[ " + b" ".join(_ser(x) for x in v) + b" ]"
    if isinstance(v, dict):
        parts = [b"/" + k.encode("latin-1") + b" " + _ser(x)
                 for k, x in v.items()]
        return b"<< " + b" ".join(parts) + b" >>"
    raise TypeError(f"cannot serialize {type(v)}")


def _pad16(data: bytes) -> bytes:
    m = 16 - (len(data) % 16)
    return data + bytes([m]) * m


def _obj_key(file_key: bytes, num: int, gen: int, aes: bool) -> bytes:
    h = hashlib.md5()
    h.update(file_key)
    h.update(struct.pack("<I", num)[:3])
    h.update(struct.pack("<I", gen)[:2])
    if aes:
        h.update(b"sAlT")
    return h.digest()[:min(len(file_key) + 5, 16)]


def _iv_for(num: int, gen: int) -> bytes:
    return hashlib.md5(b"iv" + struct.pack("<II", num, gen)).digest()


def encrypt_pdf(pdf: bytes, method: str = "rc4",
                file_id: bytes = b"fixture-id-0123!",
                user_password: bytes = b"") -> bytes:
    """Re-emit ``pdf`` with every string and stream encrypted under the
    standard handler. ``method``: ``rc4`` (R3/V2), ``aesv2`` (R4/V4
    AES-128) or ``aesv3`` (R6/V5 AES-256). A non-empty
    ``user_password`` produces a file the engine must REJECT cleanly
    (it only opens empty-user-password documents)."""
    doc = PdfDocument(pdf)
    p = 0xFFFFF0C0        # typical permissive /P with reserved bits set
    upad = (user_password + _PAD)[:32]

    if method in ("rc4", "aesv2"):
        keylen = 16
        r = 3 if method == "rc4" else 4
        # Algorithm 3: /O from empty owner+user password
        okey = hashlib.md5(_PAD).digest()
        if r >= 3:
            for _ in range(50):
                okey = hashlib.md5(okey[:keylen]).digest()
        okey = okey[:keylen]
        o = rc4(okey, _PAD)
        if r >= 3:
            for i in range(1, 20):
                o = rc4(bytes(b ^ i for b in okey), o)
        # Algorithm 2: file key from the user password
        h = hashlib.md5()
        h.update(upad)
        h.update(o[:32])
        h.update(struct.pack("<I", p & 0xFFFFFFFF))
        h.update(file_id)
        key = h.digest()
        for _ in range(50):
            key = hashlib.md5(key[:keylen]).digest()
        key = key[:keylen]
        # Algorithm 5: /U
        u = hashlib.md5(_PAD + file_id).digest()
        u = rc4(key, u)
        for i in range(1, 20):
            u = rc4(bytes(b ^ i for b in key), u)
        u = u + b"\x00" * 16
        aes = method == "aesv2"
        enc_dict = {
            Name("Filter"): Name("Standard"),
            Name("V"): 2 if method == "rc4" else 4,
            Name("R"): r,
            Name("Length"): 128,
            Name("P"): p - (1 << 32),
            Name("O"): o,
            Name("U"): u,
        }
        if aes:
            enc_dict[Name("CF")] = {
                Name("StdCF"): {Name("CFM"): Name("AESV2"),
                                Name("Length"): 16}}
            enc_dict[Name("StmF")] = Name("StdCF")
            enc_dict[Name("StrF")] = Name("StdCF")

        def enc(num, gen, data):
            if aes:
                iv = _iv_for(num, gen)
                return iv + aes_cbc_encrypt(
                    _obj_key(key, num, gen, True), iv, _pad16(data))
            return rc4(_obj_key(key, num, gen, False), data)

    elif method == "aesv3":
        key = hashlib.sha256(b"fixture-file-key").digest()
        vsalt, ksalt = b"VSALT&U!", b"KSALT&U!"
        u = _hash_2b(user_password, vsalt, b"") + vsalt + ksalt
        ue = aes_cbc_encrypt(_hash_2b(user_password, ksalt, b""),
                             b"\x00" * 16, key)
        ovs, oks = b"OVSALT&!", b"OKSALT&!"
        o = _hash_2b(b"", ovs, u[:48]) + ovs + oks
        oe = aes_cbc_encrypt(_hash_2b(b"", oks, u[:48]), b"\x00" * 16, key)
        perms = aes_cbc_encrypt(key, b"\x00" * 16,
                                struct.pack("<I", p & 0xFFFFFFFF)
                                + b"\xff\xff\xff\xffTadb" + b"\x00" * 4)
        enc_dict = {
            Name("Filter"): Name("Standard"),
            Name("V"): 5, Name("R"): 6, Name("Length"): 256,
            Name("P"): p - (1 << 32),
            Name("O"): o, Name("U"): u,
            Name("OE"): oe, Name("UE"): ue, Name("Perms"): perms,
            Name("CF"): {Name("StdCF"): {Name("CFM"): Name("AESV3"),
                                         Name("Length"): 32}},
            Name("StmF"): Name("StdCF"), Name("StrF"): Name("StdCF"),
        }

        def enc(num, gen, data):
            iv = _iv_for(num, gen)
            return iv + aes_cbc_encrypt(key, iv, _pad16(data))

    else:
        raise ValueError(f"unknown method {method}")

    def walk_strings(v, num, gen):
        if isinstance(v, bytes):
            return enc(num, gen, v)
        if isinstance(v, dict):
            return {k: walk_strings(x, num, gen) for k, x in v.items()}
        if isinstance(v, list):
            return [walk_strings(x, num, gen) for x in v]
        return v

    out = bytearray(b"%PDF-1.7\n%\xe2\xe3\xcf\xd3\n")
    max_num = 0
    for num in sorted(doc._offsets):
        gen = doc._gens.get(num, 0)
        obj = doc.get_object(num)
        if obj is None:
            continue
        max_num = max(max_num, num)
        out += f"{num} {gen} obj\n".encode()
        if isinstance(obj, Stream):
            payload = enc(num, gen, obj.raw)
            d = walk_strings(dict(obj.dict), num, gen)
            d[Name("Length")] = len(payload)
            out += _ser(d) + b"\nstream\n" + payload + b"\nendstream"
        else:
            out += _ser(walk_strings(obj, num, gen))
        out += b"\nendobj\n"

    enc_num = max_num + 1
    out += f"{enc_num} 0 obj\n".encode() + _ser(enc_dict) + b"\nendobj\n"

    trailer = {k: v for k, v in doc.trailer.items()
               if k in ("Root", "Info", "Size")}
    trailer[Name("Encrypt")] = Ref(enc_num, 0)
    trailer[Name("ID")] = [file_id, file_id]
    out += b"trailer\n" + _ser(trailer) + b"\n%%EOF\n"
    return bytes(out)
