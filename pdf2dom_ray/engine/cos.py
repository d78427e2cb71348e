"""Minimal PDF object-graph parser (COS layer).

The reference delegates this to Apache PDFBox (``PDDocument.load`` —
`/root/reference/src/main/java/org/fit/pdfdom/PDFToHTML.java:73`); this
engine implements the subset of ISO 32000 needed by the walker from
scratch:

* object lexer: numbers, names (#xx), literal + hex strings, arrays,
  dicts, booleans, null, indirect references,
* robust document scan: instead of trusting the xref table the loader
  scans for ``N G obj`` headers and parses objects lazily — the same
  recovery strategy PDFBox applies to broken files, used here
  unconditionally because at 10^12-document web scale a meaningful
  fraction of inputs has damaged xrefs,
* streams with /Length resolution and FlateDecode / ASCIIHexDecode,
* page-tree walk with inheritable attributes (Resources, MediaBox,
  CropBox, Rotate),
* numeric/string coercions mirroring ``intValue`` / ``floatValue`` /
  ``stringValue`` (`PDFBoxTree.java:862-906`).

Unsupported constructs (xref streams with compressed object streams,
encryption, predictors) raise ``PdfParseError`` which the pipeline maps
to an ``error`` row — a malformed document never kills a worker.
"""

from __future__ import annotations

import re
import zlib

import numpy as np

__all__ = [
    "Name", "Ref", "Stream", "PdfParseError", "PdfDocument", "Page",
    "Lexer", "int_value", "float_value", "string_value",
]

_WS = b"\x00\t\n\x0c\r "
_DELIM = b"()<>[]{}/%"


class PdfParseError(Exception):
    pass


class Name(str):
    """A PDF name object (``/Foo``)."""
    __slots__ = ()


class Ref(tuple):
    """Indirect reference (num, gen)."""
    __slots__ = ()

    def __new__(cls, num: int, gen: int):
        return super().__new__(cls, (num, gen))


class Stream:
    __slots__ = ("dict", "raw", "_doc", "_decoded")

    def __init__(self, d: dict, raw: bytes, doc: "PdfDocument | None"):
        self.dict = d
        self.raw = raw
        self._doc = doc
        self._decoded: bytes | None = None

    def data(self) -> bytes:
        if self._decoded is None:
            self._decoded = _decode_stream(self.dict, self.raw, self._doc)
        return self._decoded


def _apply_png_predictor(data: bytes, colors: int, bpc: int,
                         columns: int) -> bytes:
    """PNG predictors (Sub/Up/Average/Paeth) per RFC 2083 — used by
    Flate/LZW DecodeParms with /Predictor >= 10."""
    bpp = max(1, (colors * bpc + 7) // 8)
    row_len = (columns * colors * bpc + 7) // 8
    stride = row_len + 1
    nrows = len(data) // stride
    if nrows == 0:
        return data
    arr = np.frombuffer(data[:nrows * stride], dtype=np.uint8).reshape(
        nrows, stride)
    out = np.zeros((nrows, row_len), dtype=np.uint8)
    prev = np.zeros(row_len, dtype=np.int32)
    for r in range(nrows):
        ftype = arr[r, 0]
        row = arr[r, 1:].astype(np.int32)
        if ftype == 0:
            cur = row
        elif ftype == 1:  # Sub
            cur = row.copy()
            for i in range(bpp, row_len):
                cur[i] = (cur[i] + cur[i - bpp]) & 0xFF
        elif ftype == 2:  # Up
            cur = (row + prev) & 0xFF
        elif ftype == 3:  # Average
            cur = row.copy()
            for i in range(row_len):
                left = cur[i - bpp] if i >= bpp else 0
                cur[i] = (cur[i] + ((left + prev[i]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            cur = row.copy()
            for i in range(row_len):
                a = cur[i - bpp] if i >= bpp else 0
                b = prev[i]
                c = prev[i - bpp] if i >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                cur[i] = (cur[i] + pred) & 0xFF
        else:
            raise PdfParseError(f"unknown PNG predictor row filter {ftype}")
        out[r] = cur.astype(np.uint8)
        prev = cur
    return out.tobytes()


def _apply_tiff_predictor(data: bytes, colors: int, bpc: int,
                          columns: int) -> bytes:
    """TIFF predictor 2 (horizontal differencing) — 8-bit components
    only; cumulative sum per component column, vectorized per row."""
    if bpc != 8:
        raise PdfParseError(f"TIFF predictor with {bpc}-bit "
                            "components unsupported")
    row_len = columns * colors
    nrows = len(data) // row_len
    if nrows == 0:
        return data
    arr = np.frombuffer(data[:nrows * row_len], dtype=np.uint8).reshape(
        nrows, columns, colors)
    out = np.cumsum(arr.astype(np.int64), axis=1, dtype=np.int64) & 0xFF
    return out.astype(np.uint8).tobytes() + data[nrows * row_len:]


def _ascii85_decode(data: bytes) -> bytes:
    """ASCII85 with PDF framing (optional <~, terminating ~>, ws
    ignored, 'z' shorthand)."""
    body = data.split(b"~>", 1)[0]
    if body.startswith(b"<~"):
        body = body[2:]
    body = re.sub(rb"\s", b"", body)
    import base64
    try:
        return base64.a85decode(body, adobe=False)
    except ValueError as e:
        raise PdfParseError(f"ASCII85Decode failed: {e}") from e


def _runlength_decode(data: bytes) -> bytes:
    """RunLengthDecode (PDF 32000 §7.4.5): length byte L — L<128 copies
    L+1 literals, L>128 repeats the next byte 257−L times, 128 = EOD."""
    out = bytearray()
    i = 0
    n = len(data)
    while i < n:
        ln = data[i]
        i += 1
        if ln == 128:
            break
        if ln < 128:
            out += data[i:i + ln + 1]
            i += ln + 1
        else:
            if i >= n:
                raise PdfParseError("RunLengthDecode truncated")
            out += bytes([data[i]]) * (257 - ln)
            i += 1
    return bytes(out)


def _lzw_decode(data: bytes) -> bytes:
    """LZWDecode (PDF 32000 §7.4.4 / TIFF variant): MSB-first variable
    9-12 bit codes, EarlyChange=1 semantics (code width bumps one code
    early), 256 = clear table, 257 = EOD."""
    out = bytearray()
    table: list[bytes] = [bytes([i]) for i in range(256)] + [b"", b""]
    width = 9
    prev: bytes | None = None
    buf = 0
    cnt = 0
    for byte in data:
        buf = (buf << 8) | byte
        cnt += 8
        while cnt >= width:
            cnt -= width
            code = (buf >> cnt) & ((1 << width) - 1)
            if code == 256:
                table = [bytes([i]) for i in range(256)] + [b"", b""]
                width = 9
                prev = None
                continue
            if code == 257:
                return bytes(out)
            if prev is None:
                if code >= len(table):
                    raise PdfParseError("bad first LZW code")
                entry = table[code]
            elif code < len(table):
                entry = table[code]
                if len(table) < 4096:
                    table.append(prev + entry[:1])
            elif code == len(table) and len(table) < 4096:
                entry = prev + prev[:1]
                table.append(entry)
            else:
                raise PdfParseError("LZW code out of range")
            out += entry
            prev = entry
            # EarlyChange=1: widen one code early; the decoder's table
            # lags the encoder's by one entry, hence the extra −1
            if len(table) >= (1 << width) - 2 and width < 12:
                width += 1
    return bytes(out)


def _decode_stream(d: dict, raw: bytes, doc) -> bytes:
    filt = d.get("Filter")
    if doc is not None:
        filt = doc.resolve(filt)
    if filt is None:
        return raw
    filters = filt if isinstance(filt, list) else [filt]

    def resolve(v):
        return doc.resolve(v) if doc is not None else v

    parms = resolve(d.get("DecodeParms"))
    parms_list = parms if isinstance(parms, list) else [parms]
    data = raw
    for i, f in enumerate(filters):
        p = resolve(parms_list[i]) if i < len(parms_list) else None
        if f == "FlateDecode":
            try:
                data = zlib.decompress(data)
            except zlib.error as e:
                raise PdfParseError(f"FlateDecode failed: {e}") from e
            if isinstance(p, dict):
                pred = int(resolve(p.get("Predictor", 1)) or 1)
                if pred >= 10:
                    data = _apply_png_predictor(
                        data,
                        int(resolve(p.get("Colors", 1)) or 1),
                        int(resolve(p.get("BitsPerComponent", 8)) or 8),
                        int(resolve(p.get("Columns", 1)) or 1))
                elif pred == 2:
                    data = _apply_tiff_predictor(
                        data,
                        int(resolve(p.get("Colors", 1)) or 1),
                        int(resolve(p.get("BitsPerComponent", 8)) or 8),
                        int(resolve(p.get("Columns", 1)) or 1))
                elif pred != 1:
                    raise PdfParseError(f"predictor {pred} unsupported")
        elif f == "ASCIIHexDecode":
            hx = re.sub(rb"[^0-9A-Fa-f]", b"", data.split(b">", 1)[0])
            if len(hx) % 2:
                hx += b"0"
            data = bytes.fromhex(hx.decode("ascii"))
        elif f == "ASCII85Decode":
            data = _ascii85_decode(data)
        elif f == "RunLengthDecode":
            data = _runlength_decode(data)
        elif f == "LZWDecode":
            data = _lzw_decode(data)
            if isinstance(p, dict):
                pred = int(resolve(p.get("Predictor", 1)) or 1)
                if pred >= 10:
                    data = _apply_png_predictor(
                        data,
                        int(resolve(p.get("Colors", 1)) or 1),
                        int(resolve(p.get("BitsPerComponent", 8)) or 8),
                        int(resolve(p.get("Columns", 1)) or 1))
                elif pred == 2:
                    data = _apply_tiff_predictor(
                        data,
                        int(resolve(p.get("Colors", 1)) or 1),
                        int(resolve(p.get("BitsPerComponent", 8)) or 8),
                        int(resolve(p.get("Columns", 1)) or 1))
        elif f in ("DCTDecode", "JPXDecode", "CCITTFaxDecode",
                   "JBIG2Decode"):
            # opaque compressed image payloads pass through; the image
            # layer decides whether it can decode them
            return data
        else:
            raise PdfParseError(f"unsupported filter {f}")
    return data


class Lexer:
    """Tokenizer/parser for PDF object syntax over a bytes buffer."""

    __slots__ = ("buf", "pos", "end")

    def __init__(self, buf: bytes, pos: int = 0, end: int | None = None):
        self.buf = buf
        self.pos = pos
        self.end = len(buf) if end is None else end

    def skip_ws(self) -> None:
        buf, pos, end = self.buf, self.pos, self.end
        while pos < end:
            c = buf[pos]
            if c in _WS:
                pos += 1
            elif c == 0x25:  # '%' comment to EOL
                while pos < end and buf[pos] not in b"\r\n":
                    pos += 1
            else:
                break
        self.pos = pos

    def peek(self) -> int:
        return self.buf[self.pos] if self.pos < self.end else -1

    def _read_token_word(self) -> bytes:
        start = self.pos
        buf, end = self.buf, self.end
        while self.pos < end and buf[self.pos] not in _WS and buf[self.pos] not in _DELIM:
            self.pos += 1
        return buf[start:self.pos]

    def read_name(self) -> Name:
        assert self.buf[self.pos] == 0x2F  # '/'
        self.pos += 1
        raw = self._read_token_word()
        if b"#" in raw:
            out = bytearray()
            i = 0
            while i < len(raw):
                if raw[i] == 0x23 and i + 2 < len(raw):
                    out.append(int(raw[i + 1:i + 3], 16))
                    i += 3
                else:
                    out.append(raw[i])
                    i += 1
            raw = bytes(out)
        return Name(raw.decode("latin-1"))

    def read_literal_string(self) -> bytes:
        # assumes at '('
        buf, end = self.buf, self.end
        pos = self.pos + 1
        depth = 1
        out = bytearray()
        while pos < end:
            c = buf[pos]
            if c == 0x5C:  # backslash
                pos += 1
                if pos >= end:
                    break
                e = buf[pos]
                if e in b"nrtbf":
                    out.append({0x6E: 10, 0x72: 13, 0x74: 9, 0x62: 8, 0x66: 12}[e])
                    pos += 1
                elif e in b"()\\":
                    out.append(e)
                    pos += 1
                elif 0x30 <= e <= 0x37:  # octal, up to 3 digits
                    oct_digits = bytearray([e])
                    pos += 1
                    while pos < end and len(oct_digits) < 3 and 0x30 <= buf[pos] <= 0x37:
                        oct_digits.append(buf[pos])
                        pos += 1
                    out.append(int(oct_digits, 8) & 0xFF)
                elif e in b"\r\n":  # line continuation
                    pos += 1
                    if e == 0x0D and pos < end and buf[pos] == 0x0A:
                        pos += 1
                else:
                    out.append(e)
                    pos += 1
            elif c == 0x28:  # '('
                depth += 1
                out.append(c)
                pos += 1
            elif c == 0x29:  # ')'
                depth -= 1
                if depth == 0:
                    pos += 1
                    break
                out.append(c)
                pos += 1
            else:
                out.append(c)
                pos += 1
        self.pos = pos
        return bytes(out)

    def read_hex_string(self) -> bytes:
        # assumes at '<' (single)
        endidx = self.buf.find(b">", self.pos + 1)
        if endidx < 0:
            raise PdfParseError("unterminated hex string")
        hx = re.sub(rb"[^0-9A-Fa-f]", b"", self.buf[self.pos + 1:endidx])
        self.pos = endidx + 1
        if len(hx) % 2:
            hx += b"0"
        return bytes.fromhex(hx.decode("ascii"))

    _NUM_RE = re.compile(rb"[+-]?(?:\d+\.?\d*|\.\d+)")

    def parse_object(self, allow_ref: bool = True):
        self.skip_ws()
        if self.pos >= self.end:
            raise PdfParseError("unexpected end of data")
        c = self.buf[self.pos]
        if c == 0x2F:  # '/'
            return self.read_name()
        if c == 0x28:  # '('
            return self.read_literal_string()
        if c == 0x3C:  # '<'
            if self.buf[self.pos + 1:self.pos + 2] == b"<":
                return self._parse_dict()
            return self.read_hex_string()
        if c == 0x5B:  # '['
            self.pos += 1
            arr = []
            while True:
                self.skip_ws()
                if self.pos >= self.end:
                    raise PdfParseError("unterminated array")
                if self.buf[self.pos] == 0x5D:
                    self.pos += 1
                    return arr
                arr.append(self.parse_object(allow_ref))
        if c in b"+-.0123456789":
            m = self._NUM_RE.match(self.buf, self.pos)
            if not m:
                raise PdfParseError(f"bad number at {self.pos}")
            tok = m.group(0)
            self.pos = m.end()
            if b"." in tok:
                return float(tok)
            n = int(tok)
            if allow_ref:
                # look ahead for "gen R"
                save = self.pos
                self.skip_ws()
                m2 = re.compile(rb"(\d+)\s+R(?![A-Za-z0-9])").match(
                    self.buf, self.pos)
                # ensure only whitespace was skipped (no comments altering semantics)
                if m2:
                    self.pos = m2.end()
                    return Ref(n, int(m2.group(1)))
                self.pos = save
            return n
        word = self._read_token_word()
        if word == b"true":
            return True
        if word == b"false":
            return False
        if word == b"null":
            return None
        raise PdfParseError(f"unexpected token {word[:20]!r} at {self.pos}")

    def _parse_dict(self) -> dict:
        self.pos += 2  # '<<'
        d: dict = {}
        while True:
            self.skip_ws()
            if self.pos >= self.end:
                raise PdfParseError("unterminated dict")
            if self.buf[self.pos:self.pos + 2] == b">>":
                self.pos += 2
                return d
            if self.buf[self.pos] != 0x2F:
                raise PdfParseError(f"dict key is not a name at {self.pos}")
            key = self.read_name()
            d[key] = self.parse_object()


_OBJ_HEADER_RE = re.compile(rb"(?<![0-9])(\d{1,10})[\x00\t\n\x0c\r ]+(\d{1,5})"
                            rb"[\x00\t\n\x0c\r ]+obj\b")
_TRAILER_RE = re.compile(rb"trailer")


def int_value(v) -> int:
    """``intValue`` coercion (PDFBoxTree.java:862-868)."""
    if isinstance(v, bool):
        return 0
    if isinstance(v, (int, float)):
        return int(v)
    return 0


def float_value(v) -> float:
    """``floatValue`` coercion (PDFBoxTree.java:875-881) — Java float."""
    if isinstance(v, bool):
        return float(np.float32(0))
    if isinstance(v, (int, float)):
        return float(np.float32(v))
    return float(np.float32(0))


def string_value(v) -> str:
    """``stringValue`` coercion (PDFBoxTree.java:898-906)."""
    if isinstance(v, bytes):
        return decode_pdf_text_string(v)
    if isinstance(v, bool):
        return ""
    if isinstance(v, (int, float)):
        from .javafloat import jfloat_str
        return jfloat_str(v)
    return ""


def decode_pdf_text_string(b: bytes) -> str:
    """PDF text string: UTF-16BE with BOM, else PDFDocEncoding (≈latin-1)."""
    if b[:2] == b"\xfe\xff":
        return b[2:].decode("utf-16-be", errors="replace")
    return b.decode("latin-1")


class Page:
    __slots__ = ("dict", "resources", "media_box", "crop_box", "rotation", "doc")

    def __init__(self, doc: "PdfDocument", d: dict, inherited: dict):
        self.doc = doc
        self.dict = d

        def attr(name, default=None):
            v = d.get(name, inherited.get(name, default))
            return doc.resolve(v)

        self.resources = attr("Resources", {}) or {}
        mb = attr("MediaBox", [0, 0, 612, 792])
        cb = attr("CropBox", mb)
        self.media_box = [float_value(doc.resolve(x)) for x in mb]
        self.crop_box = [float_value(doc.resolve(x)) for x in cb]
        rot = int_value(attr("Rotate", 0)) % 360
        if rot < 0:
            rot += 360
        self.rotation = rot if rot in (90, 180, 270) else 0

    # crop box helpers (PDRectangle semantics)
    @property
    def crop_w(self) -> float:
        return float(np.float32(self.crop_box[2] - self.crop_box[0]))

    @property
    def crop_h(self) -> float:
        return float(np.float32(self.crop_box[3] - self.crop_box[1]))

    def content_bytes(self) -> bytes:
        c = self.doc.resolve(self.dict.get("Contents"))
        if c is None:
            return b""
        if isinstance(c, Stream):
            return c.data()
        if isinstance(c, list):
            parts = []
            for item in c:
                s = self.doc.resolve(item)
                if isinstance(s, Stream):
                    parts.append(s.data())
            return b"\n".join(parts)
        return b""


class PdfDocument:
    """A parsed PDF: lazy object map built by a full-file object scan."""

    def __init__(self, data: bytes):
        if not data or b"%PDF" not in data[:1024]:
            raise PdfParseError("not a PDF (missing %PDF header)")
        self.data = data
        self._offsets: dict[int, int] = {}
        self._gens: dict[int, int] = {}
        for m in _OBJ_HEADER_RE.finditer(data):
            # later definitions win (incremental updates)
            num = int(m.group(1))
            self._offsets[num] = m.end()
            self._gens[num] = int(m.group(2))
        if not self._offsets:
            raise PdfParseError("no objects found")
        self._cache: dict[int, object] = {}
        # objects living inside compressed object streams (PDF 1.5
        # /ObjStm): num -> (objstm_num, header offset). Registered up
        # front by scanning every ObjStm header; bodies parse lazily.
        self._compressed: dict[int, tuple[int, int]] = {}
        self._decryptor = None
        self._encrypt_obj_num: int | None = None
        # trailer first: the /Encrypt handler must exist before any
        # encrypted stream (ObjStm payloads included) is touched.
        # XRef streams parsed here are unencrypted by spec.
        self.trailer = self._find_trailer()
        if "Encrypt" in self.trailer:
            self._setup_decryption()
        self._scan_object_streams()
        self.catalog = self._find_catalog()
        self.info = self.resolve(self.trailer.get("Info")) if self.trailer else None
        self.pages = self._collect_pages()

    def _setup_decryption(self) -> None:
        """Standard security handler with the empty user password
        (PDFBox decrypts these transparently on load —
        `PDFToHTML.java:73`). Anything else degrades to a clean
        PdfParseError → error row."""
        from .crypt import (StandardSecurityHandler,
                            UnsupportedEncryptionError, WrongPasswordError)
        enc_ref = self.trailer.get("Encrypt")
        if isinstance(enc_ref, Ref):
            self._encrypt_obj_num = enc_ref[0]
        enc = self.resolve(enc_ref)
        if not isinstance(enc, dict):
            raise PdfParseError("malformed /Encrypt dictionary")
        ids = self.resolve(self.trailer.get("ID"))
        fid = b""
        if isinstance(ids, list) and ids and isinstance(ids[0], bytes):
            fid = ids[0]
        try:
            self._decryptor = StandardSecurityHandler(enc, fid, self.resolve)
        except (WrongPasswordError, UnsupportedEncryptionError) as e:
            raise PdfParseError(f"encrypted PDF: {e}") from e

    def _decrypt_object(self, obj, num: int, gen: int):
        """Apply the object cipher to strings (recursively) and stream
        payloads of a freshly parsed top-level object. XRef streams and
        (when /EncryptMetadata false) Metadata streams stay raw."""
        dec = self._decryptor

        def walk(v):
            if isinstance(v, bytes):
                return dec.decrypt(num, gen, v, is_string=True)
            if isinstance(v, dict):
                return {k: walk(x) for k, x in v.items()}
            if isinstance(v, list):
                return [walk(x) for x in v]
            return v

        if isinstance(obj, Stream):
            obj.dict = walk(obj.dict)
            t = obj.dict.get("Type")
            if t != "XRef" and not (t == "Metadata"
                                    and not dec.encrypt_metadata):
                obj.raw = dec.decrypt(num, gen, obj.raw, is_string=False)
            return obj
        return walk(obj)

    def _scan_object_streams(self) -> None:
        for num in list(self._offsets):
            off = self._offsets[num]
            # cheap peek: only parse objects whose dict mentions /ObjStm
            window = self.data[off:off + 512]
            if b"/ObjStm" not in window:
                continue
            try:
                obj = self.get_object(num)
            except PdfParseError:
                continue
            if not (isinstance(obj, Stream) and obj.dict.get("Type") == "ObjStm"):
                continue
            try:
                payload = obj.data()
                n = int_value(self.resolve(obj.dict.get("N", 0)))
                first = int_value(self.resolve(obj.dict.get("First", 0)))
            except PdfParseError:
                continue
            lex = Lexer(payload, 0, min(first, len(payload)))
            for _ in range(min(n, 10_000)):
                try:
                    onum = lex.parse_object(allow_ref=False)
                    ooff = lex.parse_object(allow_ref=False)
                except PdfParseError:
                    break
                if isinstance(onum, int) and isinstance(ooff, int):
                    # top-level (uncompressed) definitions win only when
                    # they appear later in the file; compressed objects
                    # fill gaps the header scan cannot see
                    if onum not in self._offsets:
                        self._compressed[onum] = (num, first + ooff)

    # -- object access -------------------------------------------------
    def get_object(self, num: int):
        if num in self._cache:
            return self._cache[num]
        off = self._offsets.get(num)
        if off is None:
            loc = self._compressed.get(num)
            if loc is None:
                return None
            self._cache[num] = None  # cycle guard
            stm = self.get_object(loc[0])
            if not isinstance(stm, Stream):
                return None
            lex = Lexer(stm.data(), loc[1])
            try:
                obj = lex.parse_object(allow_ref=True)
            except PdfParseError:
                obj = None
            self._cache[num] = obj
            return obj
        self._cache[num] = None  # cycle guard
        lex = Lexer(self.data, off)
        obj = lex.parse_object()
        lex.skip_ws()
        if isinstance(obj, dict) and self.data[lex.pos:lex.pos + 6] == b"stream":
            pos = lex.pos + 6
            if self.data[pos:pos + 2] == b"\r\n":
                pos += 2
            elif self.data[pos:pos + 1] in (b"\n", b"\r"):
                pos += 1
            length = self.resolve(obj.get("Length"))
            if isinstance(length, (int, float)) and length >= 0 \
                    and self.data[pos + int(length):pos + int(length) + 32].lstrip(
                        bytes(_WS)).startswith(b"endstream"):
                raw = self.data[pos:pos + int(length)]
            else:
                endidx = self.data.find(b"endstream", pos)
                if endidx < 0:
                    raise PdfParseError(f"unterminated stream in object {num}")
                raw = self.data[pos:endidx]
                if raw.endswith(b"\r\n"):
                    raw = raw[:-2]
                elif raw.endswith(b"\n") or raw.endswith(b"\r"):
                    raw = raw[:-1]
            obj = Stream(obj, raw, self)
        if self._decryptor is not None and num != self._encrypt_obj_num:
            obj = self._decrypt_object(obj, num, self._gens.get(num, 0))
        self._cache[num] = obj
        return obj

    def resolve(self, v):
        seen = 0
        while isinstance(v, Ref):
            v = self.get_object(v[0])
            seen += 1
            if seen > 32:
                raise PdfParseError("reference cycle")
        return v

    # -- document structure --------------------------------------------
    def _find_trailer(self) -> dict:
        best: dict = {}
        for m in _TRAILER_RE.finditer(self.data):
            try:
                lex = Lexer(self.data, m.end())
                d = lex.parse_object()
                if isinstance(d, dict):
                    best = d
            except PdfParseError:
                continue
        if not best:
            # PDF 1.5 cross-reference STREAMS carry the trailer fields
            # (/Root /Info /Size) in the /Type /XRef stream dict and have
            # no "trailer" keyword at all
            for num in self._offsets:
                window = self.data[self._offsets[num]:self._offsets[num] + 512]
                if b"/XRef" not in window:
                    continue
                try:
                    obj = self.get_object(num)
                except PdfParseError:
                    continue
                if isinstance(obj, Stream) and obj.dict.get("Type") == "XRef":
                    best = obj.dict
        return best

    def _find_catalog(self) -> dict:
        root = self.resolve(self.trailer.get("Root")) if self.trailer else None
        if isinstance(root, dict) and "Pages" in root:
            return root
        # recovery: scan for /Type /Catalog (top-level and compressed)
        for num in list(self._offsets) + list(self._compressed):
            try:
                obj = self.get_object(num)
            except PdfParseError:
                continue
            if isinstance(obj, dict) and obj.get("Type") == "Catalog":
                return obj
        raise PdfParseError("no document catalog")

    def _collect_pages(self) -> list[Page]:
        pages: list[Page] = []
        root = self.resolve(self.catalog.get("Pages"))
        if not isinstance(root, dict):
            raise PdfParseError("catalog has no page tree")
        inheritable = ("Resources", "MediaBox", "CropBox", "Rotate")
        seen: set[int] = set()

        def walk(node_ref, node, inherited: dict, depth: int):
            if depth > 64 or len(pages) > 100_000:
                raise PdfParseError("page tree too deep/large")
            if isinstance(node_ref, Ref):
                if node_ref[0] in seen:
                    return
                seen.add(node_ref[0])
            t = node.get("Type")
            if t == "Page" or ("Kids" not in node and t != "Pages"):
                pages.append(Page(self, node, inherited))
                return
            inh = dict(inherited)
            for k in inheritable:
                if k in node:
                    inh[k] = node[k]
            for kid_ref in self.resolve(node.get("Kids")) or []:
                kid = self.resolve(kid_ref)
                if isinstance(kid, dict):
                    walk(kid_ref, kid, inh, depth + 1)

        walk(None, root, {}, 0)
        if not pages:
            raise PdfParseError("document has no pages")
        return pages

    def title(self) -> str | None:
        if isinstance(self.info, dict):
            t = self.resolve(self.info.get("Title"))
            if isinstance(t, bytes):
                return decode_pdf_text_string(t)
        return None
